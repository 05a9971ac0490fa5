"""Time each stage of the fused MSM at a given size on the real chip.

Stages: digit extraction, batched sort, gather, slab+transpose,
bucket kernel, fused group, full msm.

Usage: python tools/msm_stage_time.py [n_log2] [c]
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

from co_zkvms_tpu.ops import curve as C, field as F, msm as M
from co_zkvms_tpu.ops import curve_pallas as CP
from co_zkvms_tpu.ops import ref_bn254 as bn
from co_zkvms_tpu.ops.field import FR

n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
c = int(sys.argv[2]) if len(sys.argv) > 2 else 12
n = 1 << n_log2
print(f"devices: {jax.devices()} n=2^{n_log2} c={c}", flush=True)


@jax.jit
def _squash(outs):
    acc = jnp.uint32(0)
    for x in jax.tree.leaves(outs):
        acc = acc + jnp.sum(x, dtype=jnp.uint32)
    return acc


def sync(out):
    """ONE device_get round trip (block_until_ready lies via the relay)."""
    return int(jax.device_get(_squash(out)))


def bench(label, fn, reps=3):
    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    print(f"{label:28s} {min(ts)*1e3:9.1f} ms", flush=True)
    return min(ts)


g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
g1 = C.APoint(g.x[0], g.y[0])
exps = F.random(FR, jax.random.key(100 + n_log2), (n,))
pts = C.to_affine(M.fixed_base_msm(g1, exps))
sc = F.random(FR, jax.random.key(200 + n_log2), (n,))
sync((pts.x, sc))
print("setup done", flush=True)

nw = M._n_windows(c)
nb = 1 << c

t_full0 = time.time()
res = M.msm(pts, sc, c=c)
sync(res.x)
print(f"full msm warm+run: {time.time()-t_full0:.1f}s", flush=True)
for _ in range(2):
    t0 = time.time()
    res = M.msm(pts, sc, c=c)
    sync(res.x)
    t_full = time.time() - t0
    print(f"full msm steady: {t_full*1e3:.1f} ms -> {n/t_full:,.0f} pts/s",
          flush=True)

plan = M._plan_msm(pts, sc, c)
got1 = jax.device_get(plan["fetch"])
fetch2 = M._plan_sort(plan, got1)
got2 = jax.device_get(fetch2)
occs = [int(v) for v in got2["occs"]]
print(f"occs max(low)={max(occs[:nw-1])} top-row={occs[-1]}", flush=True)

bench("window_digits", lambda: M.window_digits(sc, c))
digits = plan["digits"]
dig2, kb, k_split, nb_top = M._top_regroup(digits, c)
top_row = digits[nw - 1] if k_split == 1 else dig2
rows = jnp.concatenate([digits[: nw - 1], top_row[None]], axis=0)
bench("sort_rows (all windows)", lambda: M._sort_rows(rows))
ds, order = M._sort_rows(rows)
bench("occs_from_sorted", lambda: M._occs_from_sorted(ds, c))

pts32 = jnp.concatenate([pts.x, pts.y], axis=-1)
sync(pts32)

r_low = M._quant(max(max(occs[: nw - 1]), 1))
u = M._UNROLL
s = max(1, (nb * u) // M._LANES)
r_eff = ((r_low + u - 1) // u) * u
print(f"r_low={r_low} u={u} s={s} r_eff={r_eff}", flush=True)

d0, o0 = ds[0], order[0]
f_gather = jax.jit(lambda o: jnp.take(pts32, o, axis=0))
bench("gather (1 win)", lambda: f_gather(o0))
bench("dense_grid_sorted (1 win)",
      lambda: M._dense_grid_sorted(pts32, d0, o0, c, r_eff))

qx, qy = M._dense_grid_sorted(pts32, d0, o0, c, r_eff)
qx, qy = qx.copy(), qy.copy()
sync((qx, qy))
nbc = nb // s
gx = qx[:, :, :nbc].reshape(r_eff // u, u, 16, nbc).transpose(0, 2, 1, 3)
gx = gx.reshape(r_eff // u, 16, u * nbc).copy()
gy = qy[:, :, :nbc].reshape(r_eff // u, u, 16, nbc).transpose(0, 2, 1, 3)
gy = gy.reshape(r_eff // u, 16, u * nbc).copy()
sync((gx, gy))
bench(f"bucket kernel 1/{s} win",
      lambda: CP.bucket_accumulate(gx, gy, u * nbc))

bench("fused_group (low wins)",
      lambda: M._fused_group(pts32, ds[: nw - 1], order[: nw - 1], c,
                             r_eff), reps=1)
