"""Time the degree-3 sumcheck prove at 2^n on the chip (honest sync).

Usage: python tools/sumcheck_probe.py [n_log2]
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

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import poly as P
from co_zkvms_tpu.ops import sumcheck as SC
from co_zkvms_tpu.ops import transcript as T
from co_zkvms_tpu.ops.field import FR

n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
n = 1 << n_log2
print(f"devices: {jax.devices()} n=2^{n_log2} CHUNK={SC.CHUNK}", flush=True)


@jax.jit
def _squash(outs):
    acc = jnp.uint32(0)
    for x in jax.tree.leaves(outs):
        acc = acc + jnp.sum(x, dtype=jnp.uint32)
    return acc


def sync(out):
    return int(jax.device_get(_squash(out)))


polys = [F.random(FR, jax.random.key(10 + i), (n,)) for i in range(4)]
state = T.HostTranscript(b"bench").device_state()
sync(polys)


def comb(ps):
    eq, az, bz, cz = ps
    return F.mul(FR, eq, F.sub(FR, F.mul(FR, az, bz), cz))


comb.lv = lambda f, ps: f.mul(ps[0], f.sub(f.mul(ps[1], ps[2]), ps[3]))


taus = F.random(FR, jax.random.key(14), (n_log2,))
eq_t = P.eq_table(FR, taus)
sync(eq_t)


def run(use_split):
    if use_split:
        return SC.prove(FR, state, polys[1:], degree=3, comb=comb,
                        eq_split=taus)
    return SC.prove(FR, state, [eq_t] + polys[1:], degree=3, comb=comb)


for mode, label in ((True, "split-eq"), (False, "eq-in-comb")):
    t0 = time.time()
    res = run(mode)
    sync(res.round_msgs)
    print(f"{label} warm: {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        res = run(mode)
        sync(res.round_msgs)
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"{label} prove 2^{n_log2}: {dt*1e3:.1f} ms -> "
          f"{n/dt/1e6:.1f} M elems/s", flush=True)
