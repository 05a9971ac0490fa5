"""Bit-exactness spot checks of the Pallas kernels ON THE REAL TPU.

The CPU suite runs these kernels in interpret mode; a Mosaic miscompile
(e.g. at a new block size) would only show on hardware. Checks field mul /
square / batch_inv, curve add/add_mixed/double (complete + incomplete),
bucket_accumulate, Poseidon permutation and a small msm against exact
host-side integer arithmetic.

Usage: python tools/tpu_bitcheck.py
"""

import os
import random

if os.environ.get("MSM_CACHE_DIR"):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(os.environ["MSM_CACHE_DIR"]))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax
import jax.numpy as jnp
import numpy as np

from co_zkvms_tpu.ops import curve as C, field as F, msm as M
from co_zkvms_tpu.ops import ref_bn254 as bn
from co_zkvms_tpu.ops.field import FR, FQ

rng = random.Random(99)
FAILS = []


def check(name, got_ints, want_ints):
    ok = list(got_ints) == list(want_ints)
    print(f"{name}: {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        FAILS.append(name)
        for i, (g, w) in enumerate(zip(got_ints, want_ints)):
            if g != w:
                print(f"  first mismatch at {i}: got {g:#x} want {w:#x}",
                      flush=True)
                break


def ints_of(spec, arr):
    return [int(v) for v in
            np.atleast_1d(np.asarray(jax.device_get(F.to_int(spec, arr))))]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    n = 4099   # odd size exercises padding
    a_i = [rng.randrange(FR.modulus) for _ in range(n)]
    b_i = [rng.randrange(FR.modulus) for _ in range(n)]
    a = F.from_int(FR, a_i)
    b = F.from_int(FR, b_i)

    check("mul", ints_of(FR, F.mul(FR, a, b)),
          [(x * y) % FR.modulus for x, y in zip(a_i, b_i)])
    check("square", ints_of(FR, F.square(FR, a)),
          [(x * x) % FR.modulus for x in a_i])
    inv_i = [pow(x, FR.modulus - 2, FR.modulus) if x else 0 for x in a_i]
    check("batch_inv", ints_of(FR, F.batch_inv(FR, a)), inv_i)

    # small msm vs host bigint reference
    k = 64
    g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
    g1 = C.APoint(g.x[0], g.y[0])
    exps_i = [rng.randrange(1, FR.modulus) for _ in range(k)]
    exps = F.from_int(FR, exps_i)
    pts = C.to_affine(M.fixed_base_msm(g1, exps))
    pts_ints = C.points_to_ints(pts)
    # host check of fixed-base: p_i = exps_i * G
    gx, gy = bn.g1_coords(bn.G1_GEN)
    P = FQ.modulus

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

    def h_mul(s, pt):
        acc = None
        while s:
            if s & 1:
                acc = h_add(acc, pt)
            pt = h_add(pt, pt)
            s >>= 1
        return acc

    ok_fb = all(h_mul(e, (gx, gy)) == tuple(p)
                for e, p in zip(exps_i[:8], pts_ints[:8]))
    print(f"fixed_base_msm spot: {'OK' if ok_fb else 'MISMATCH'}", flush=True)
    if not ok_fb:
        FAILS.append("fixed_base")

    sc_i = [rng.randrange(FR.modulus) for _ in range(k)]
    sc = F.from_int(FR, sc_i)
    res = M.msm(pts, sc)
    got = C.points_to_ints(C.to_affine(res))[0]
    want = None
    for e, p in zip(sc_i, pts_ints):
        want = h_add(want, h_mul(e, tuple(p)))
    print(f"msm(64) vs host bigint: "
          f"{'OK' if tuple(got) == want else 'MISMATCH'}", flush=True)
    if tuple(got) != want:
        FAILS.append("msm64")

    # fused msm at a verify-relevant size (2^12, the spartan commit shape)
    n2 = 1 << 12
    exps2 = F.random(FR, jax.random.key(5), (n2,))
    pts2 = C.to_affine(M.fixed_base_msm(g1, exps2))
    sc2 = F.random(FR, jax.random.key(6), (n2,))
    r_fused = M.msm(pts2, sc2)                  # fused path on TPU
    digits = M.window_digits(sc2, 8)
    r_base = M._horner_host(M._all_window_sums(pts2, digits, 8), 8)
    gf = C.points_to_ints(C.to_affine(r_fused))
    gb = C.points_to_ints(C.to_affine(r_base))
    print(f"msm(2^12) fused vs while-loop: "
          f"{'OK' if gf == gb else 'MISMATCH'}", flush=True)
    if gf != gb:
        FAILS.append("msm4096")

    # poseidon fused kernel vs host ints
    from co_zkvms_tpu.ops import poseidon as PP

    st_i = [[rng.randrange(FR.modulus) for _ in range(3)] for _ in range(1100)]
    st = F.from_int(FR, [v for row in st_i for v in row]).reshape(1100, 3, 16)
    out = PP.permute(st)       # batch >= 1024 -> pallas kernel on TPU
    got0 = ints_of(FR, out[0])
    want0 = PP.host_permute(st_i[0])
    check("poseidon_kernel_state0", got0, want0)
    got7 = ints_of(FR, out[777])
    check("poseidon_kernel_state777", got7, PP.host_permute(st_i[777]))

    print("BITCHECK " + ("ALL_OK" if not FAILS else f"FAILED: {FAILS}"),
          flush=True)


if __name__ == "__main__":
    main()
