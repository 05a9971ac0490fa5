"""Probe: bucket-accumulate kernel with s bucket-splits x u chains/bucket.

Keeps kernel lanes at u * (nb/s) <= 4096; measures steps/s for
(s, u) in {(1,1), (2,2), (4,4)} at c=12, r=384, n=2^20-equivalent shapes.

Usage: python tools/msm_chain_probe.py
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(
                      os.path.dirname(__file__), "..", ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from co_zkvms_tpu.ops import curve_pallas as CP

NB = 4096
R = 384


@jax.jit
def _squash(outs):
    """Reduce arbitrary outputs to ONE u32 so timing pays a single
    device_get round-trip (block_until_ready lies through the TPU relay,
    and each separate device_get costs a full relay round trip)."""
    acc = jnp.uint32(0)
    for x in jax.tree.leaves(outs):
        acc = acc + jnp.sum(x, dtype=jnp.uint32)
    return acc


def sync(out):
    return int(jax.device_get(_squash(out)))


def bench(label, fn, reps=3):
    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    print(f"{label:24s} {min(ts)*1e3:9.1f} ms", flush=True)


key = jax.random.key(0)
# synthetic affine grid (values don't matter for timing; nonzero)
qx = jax.random.randint(key, (R, 16, NB), 0, 1 << 16, dtype=jnp.int32)
qx = qx.astype(jnp.uint32)
qy = qx ^ jnp.uint32(0x5A5A)
jax.block_until_ready((qx, qy))

for u in (1, 2, 4):
    s = max(1, (NB * u) // 4096)
    nbc = NB // s
    r_eff = ((R + u - 1) // u) * u

    def run(u=u, s=s, nbc=nbc, r_eff=r_eff):
        outs = []
        for si in range(s):
            g_x = qx[:, :, si * nbc:(si + 1) * nbc]
            g_y = qy[:, :, si * nbc:(si + 1) * nbc]
            g_x = g_x.reshape(r_eff // u, u, 16, nbc).transpose(0, 2, 1, 3)
            g_y = g_y.reshape(r_eff // u, u, 16, nbc).transpose(0, 2, 1, 3)
            g_x = g_x.reshape(r_eff // u, 16, u * nbc)
            g_y = g_y.reshape(r_eff // u, 16, u * nbc)
            outs.append(CP.bucket_accumulate(g_x, g_y, u * nbc))
        return outs

    t0 = time.time()
    bench(f"s={s} u={u} steps={r_eff//u}x{s}", run)
