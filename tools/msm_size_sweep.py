"""Fused-vs-baseline MSM equality sweep across sizes/scalar styles (TPU).

The spartan-2^12 TPU failure disappears with the fused path disabled; the
2^12-random config bitchecks OK, so some OTHER (n, distribution) config in
the commit/open pipeline is wrong. Sweep n in {2^9..2^12} x {random,
eq-table, quotient-ish} and report the first mismatch.
"""

import os

if os.environ.get("MSM_CACHE_DIR"):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(os.environ["MSM_CACHE_DIR"]))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax
import jax.numpy as jnp

from co_zkvms_tpu.ops import curve as C, field as F, msm as M, poly as P
from co_zkvms_tpu.ops import ref_bn254 as bn
from co_zkvms_tpu.ops.field import FR

print(f"devices: {jax.devices()}", flush=True)
g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
g1 = C.APoint(g.x[0], g.y[0])

fails = []
for n_log2 in (9, 10, 11, 12):
    n = 1 << n_log2
    exps = F.random(FR, jax.random.key(100 + n_log2), (n,))
    pts = C.to_affine(M.fixed_base_msm(g1, exps))
    taus = F.random(FR, jax.random.key(7), (n_log2,))
    styles = {
        "random": F.random(FR, jax.random.key(200 + n_log2), (n,)),
        "eq": P.eq_table(FR, taus),
        "halfzero": jnp.concatenate([
            F.random(FR, jax.random.key(300 + n_log2), (n // 2,)),
            F.zeros((n // 2,))]),
    }
    for name, sc in styles.items():
        got = M.msm(pts, sc)                       # default path (may fuse)
        digits = M.window_digits(sc, 8)
        base = M._horner_host(M._all_window_sums(pts, digits, 8), 8)
        gi = C.points_to_ints(C.to_affine(got))
        bi = C.points_to_ints(C.to_affine(base))
        ok = gi == bi
        print(f"n=2^{n_log2} {name}: {'OK' if ok else 'MISMATCH'}",
              flush=True)
        if not ok:
            fails.append((n_log2, name))
print("SWEEP " + ("ALL_OK" if not fails else f"FAILS: {fails}"), flush=True)
