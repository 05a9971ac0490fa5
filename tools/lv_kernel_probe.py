"""Time ONE fused eval/bind kernel call at a given size on the chip.

Usage: python tools/lv_kernel_probe.py [n_log2]
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(
                      os.path.dirname(__file__), "..", ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from co_zkvms_tpu.models.spartan import _comb1
from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import sumcheck_pallas as SCP
from co_zkvms_tpu.ops.field import FR

n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = 1 << n_log2
print(f"devices: {jax.devices()} n=2^{n_log2} HH={SCP.HH}", flush=True)


@jax.jit
def _squash(outs):
    acc = jnp.uint32(0)
    for x in jax.tree.leaves(outs):
        acc = acc + jnp.sum(x, dtype=jnp.uint32)
    return acc


def sync(out):
    return int(jax.device_get(_squash(out)))


def bench(label, fn, reps=3):
    t0 = time.time()
    sync(fn())
    print(f"{label} warm: {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    print(f"{label:18s} {min(ts)*1e3:9.2f} ms", flush=True)


polys = [F.random(FR, jax.random.key(50 + i), (n,)) for i in range(4)]
bufs = [p.T.copy() for p in polys]
sync(bufs)
h = jnp.int32(n)
n_chunks = jnp.int32(max(1, (n // 2) // SCP.HH))
r = F.random(FR, jax.random.key(99), ())

bench("eval_round", lambda: SCP.eval_round(FR, 3, 4, _comb1.lv, False,
                                           bufs, None, h, n_chunks))
bench("bind_round", lambda: SCP.bind_round(FR, 4, bufs, r, h, n_chunks))
