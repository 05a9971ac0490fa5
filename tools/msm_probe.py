"""MSM warmup/compile-time decomposition probe (run on the real TPU).

Times each stage of the fused MSM pipeline separately — setup, digit
extraction, occupancies, dense grid, the Pallas bucket kernel, the fused
window group, weighted bucket sum, host Horner — so compile blowups can be
attributed to a specific kernel instead of the whole 8-minute warmup.

Usage:  python tools/msm_probe.py [n_log2] [c]
Env:    MSM_CACHE_DIR=<dir>  enable the persistent compile cache.
"""

import json
import os
import sys
import time

if os.environ.get("MSM_CACHE_DIR"):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(os.environ["MSM_CACHE_DIR"]))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax
import jax.numpy as jnp

from co_zkvms_tpu.ops import curve as C, field as F, msm as M, ref_bn254 as bn
from co_zkvms_tpu.ops.field import FR

RESULT = {}


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return int(jax.device_get(jnp.ravel(leaf)[0]))


def stage(name, fn, reps=2):
    t0 = time.time()
    out = fn()
    sync(out)
    first = time.time() - t0
    best = first
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        best = min(best, time.time() - t0)
    RESULT[name] = {"first_s": round(first, 2), "steady_s": round(best, 4)}
    print(f"{name}: first {first:.2f}s steady {best:.4f}s", flush=True)
    return out


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = 1 << n_log2
    print(f"devices: {jax.devices()}  n=2^{n_log2} c={c}", flush=True)

    t0 = time.time()
    k1, k2 = jax.random.split(jax.random.key(0))
    g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
    g1 = C.APoint(g.x[0], g.y[0])
    exps = F.random(FR, k1, (n,))
    pts = C.to_affine(M.fixed_base_msm(g1, exps))
    scalars = F.random(FR, k2, (n,))
    sync((pts.x, scalars))
    RESULT["setup_s"] = round(time.time() - t0, 2)
    print(f"setup: {RESULT['setup_s']}s", flush=True)

    nw = M._n_windows(c)
    digits = stage("window_digits", lambda: M.window_digits(scalars, c))
    occ_arr = stage("occupancies", lambda: M._occupancies(digits, c))
    occs = [int(v) for v in jax.device_get(occ_arr)]
    print(f"occs: min={min(occs)} max={max(occs)} top={occs[-1]}", flush=True)

    pts32 = jnp.concatenate([pts.x, pts.y], axis=-1)
    r_low = max(max(occs[: nw - 1]), 1)
    r_low = M._quant_rows(r_low) if hasattr(M, "_quant_rows") else r_low
    # mirror msm.py's _quant
    def _quant(r):
        if r <= 8:
            return 8
        step = 1 << (r.bit_length() - 3)
        return ((r + step - 1) // step) * step

    r_low = _quant(r_low)
    print(f"r_low={r_low}", flush=True)

    stage("dense_grid_1w", lambda: M._dense_grid(pts32, digits[0], c, r_low))

    from co_zkvms_tpu.ops import curve_pallas as CP

    nb = 1 << c
    u = min(M._UNROLL, max(1, 4096 // nb))
    r_eff = ((r_low + u - 1) // u) * u
    qx, qy, _ = M._dense_grid(pts32, digits[0], c, r_eff)
    qx = qx.reshape(r_eff // u, u, 16, nb).transpose(0, 2, 1, 3)
    qx = qx.reshape(r_eff // u, 16, u * nb)
    qy2 = qy.reshape(r_eff // u, u, 16, nb).transpose(0, 2, 1, 3)
    qy2 = qy2.reshape(r_eff // u, 16, u * nb)
    sync((qx, qy2))
    stage("bucket_accumulate", lambda: CP.bucket_accumulate(qx, qy2, u * nb))

    low = stage("fused_group_low",
                lambda: M._fused_group(pts32, digits[: nw - 1], c, r_low))

    stage("weighted_sum",
          lambda: M._weighted_sum_jit(
              C.JPoint(jnp.pad(low.x, ((0, 1), (0, 0), (0, 0))),
                       jnp.pad(low.y, ((0, 1), (0, 0), (0, 0))),
                       jnp.pad(low.z, ((0, 1), (0, 0), (0, 0)))), c))

    t0 = time.time()
    res = M.msm(pts, scalars, c=c)
    sync(res.x)
    RESULT["full_msm_first_s"] = round(time.time() - t0, 2)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        res = M.msm(pts, scalars, c=c)
        sync(res.x)
        best = min(best, time.time() - t0)
    RESULT["full_msm_steady_s"] = round(best, 3)
    RESULT["points_per_s"] = round(n / best)
    print(f"full msm: first {RESULT['full_msm_first_s']}s "
          f"steady {best:.3f}s -> {n/best:,.0f} pts/s", flush=True)
    print("PROBE_RESULT " + json.dumps(RESULT), flush=True)


if __name__ == "__main__":
    main()
