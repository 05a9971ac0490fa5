"""Localize the fused-MSM mismatch at a given size: compare per-window
weighted sums (fused vs while-loop), then the low/top grid stages.

Usage: python tools/msm_stage_diff.py [n_log2] [c]
"""

import os

if os.environ.get("MSM_CACHE_DIR"):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(os.environ["MSM_CACHE_DIR"]))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax
import jax.numpy as jnp

from co_zkvms_tpu.ops import curve as C, field as F, msm as M
from co_zkvms_tpu.ops import ref_bn254 as bn
from co_zkvms_tpu.ops.field import FR

import sys

n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 10
c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
n = 1 << n_log2
print(f"devices: {jax.devices()} n=2^{n_log2} c={c}", flush=True)

g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
g1 = C.APoint(g.x[0], g.y[0])
exps = F.random(FR, jax.random.key(100 + n_log2), (n,))
pts = C.to_affine(M.fixed_base_msm(g1, exps))
sc = F.random(FR, jax.random.key(200 + n_log2), (n,))

digits = M.window_digits(sc, c)
occs = [int(v) for v in jax.device_get(M._occupancies(digits, c))]
nw = M._n_windows(c)
print(f"occs min={min(occs)} max={max(occs)} top={occs[-1]}", flush=True)

fused = M._window_sums_fused(pts, digits, c, occs)     # weighted, [nw]
base = M._all_window_sums(pts, digits, c)              # weighted, [nw]
fa = C.points_to_ints(C.to_affine(fused))
ba = C.points_to_ints(C.to_affine(base))
bad = [w for w in range(nw) if fa[w] != ba[w]]
print(f"weighted per-window mismatches: {bad}", flush=True)

# stage deeper: raw bucket sums for the LOW group
pts32 = jnp.concatenate([pts.x, pts.y], axis=-1)


def _quant(r):
    if r <= 8:
        return 8
    step = 1 << max(r.bit_length() - 4, 0)
    return ((r + step - 1) // step) * step


r_low = _quant(max(max(occs[: nw - 1]), 1))
low = M._fused_group(pts32, digits[: nw - 1], c, r_low)   # [nw-1, nb]
# reference bucket sums via a tiny host accumulation per window
nb = 1 << c
dig_h = jax.device_get(digits)
pts_h = C.points_to_ints(pts)
P = F.FQ_MODULUS


def h_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    (x1, y1), (x2, y2) = p1, p2
    if x1 == x2:
        if y1 != y2:
            return None
        m = 3 * x1 * x1 * pow(2 * y1, -1, P) % P
    else:
        m = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (m * m - x1 - x2) % P
    return (x3, (m * (x1 - x3) - y1) % P)


low_aff = C.points_to_ints(C.to_affine(
    C.JPoint(low.x.reshape(-1, 16), low.y.reshape(-1, 16),
             low.z.reshape(-1, 16))))
bad_buckets = []
for w in range(nw - 1):
    for b_id in range(nb):
        want = None
        for i in range(n):
            if dig_h[w][i] == b_id and b_id != 0:
                want = h_add(want, tuple(pts_h[i]))
        got = tuple(low_aff[w * nb + b_id])
        want_t = (0, 0) if want is None else want
        if got != want_t:
            bad_buckets.append((w, b_id, int(dig_h[w].tolist().count(b_id))))
            if len(bad_buckets) > 12:
                break
    if len(bad_buckets) > 12:
        break
print(f"low-group bad buckets (w, b, count): {bad_buckets[:12]}", flush=True)
print("DONE", flush=True)
