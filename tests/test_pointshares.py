"""Rep3 EC point shares (rep3/pointshare/types.rs parity): share/combine
roundtrip, local linearity, and the PCS merge identity
commit(sum shares) = sum commit(share)."""

import random

import jax

from co_zkvms_tpu.ops import curve as C
from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import msm as M
from co_zkvms_tpu.ops import ref_bn254 as bn
from co_zkvms_tpu.ops.field import FQ, FR
from co_zkvms_tpu.parallel import pointshares as PS
from co_zkvms_tpu.parallel import shares as Sh

MOD = FR.modulus


def _points(rng, n):
    pts = [bn.scalar_mul(bn.G1_GEN, rng.randrange(2, bn.R_ORDER))
           for _ in range(n)]
    ap = C.points_from_ints([bn.g1_coords(p) for p in pts])
    return pts, C.JPoint(ap.x, ap.y,
                         F.ones_mont(FQ, ap.x.shape[:-1]))


def test_share_combine_roundtrip(rng):
    pts, jp = _points(rng, 3)
    stack = PS.share(jax.random.key(1), jp)
    back = C.points_to_ints(C.to_affine(PS.combine(stack)))
    assert back == [bn.g1_coords(p) for p in pts]


def test_add_is_local_and_homomorphic(rng):
    pts_a, ja = _points(rng, 2)
    pts_b, jb = _points(rng, 2)
    sa = PS.share(jax.random.key(2), ja)
    sb = PS.share(jax.random.key(3), jb)
    got = C.points_to_ints(C.to_affine(PS.combine(PS.add(sa, sb))))
    want = [bn.g1_coords(bn.add(a, b)) for a, b in zip(pts_a, pts_b)]
    assert got == want
    # share + public point: party-0 convention
    got2 = C.points_to_ints(C.to_affine(PS.combine(PS.add_public(sa, jb))))
    assert got2 == want


def test_msm_shares_is_commitment_share(rng):
    """Per-party MSMs over Rep3 coefficient shares combine to the MSM of
    the plaintext coefficients — the PCS merge algebra on device."""
    n = 8
    pts, _ = _points(rng, n)
    bases = C.points_from_ints([bn.g1_coords(p) for p in pts])
    coeffs = [rng.randrange(MOD) for _ in range(n)]
    stack = Sh.share(FR, jax.random.key(4), F.from_int(FR, coeffs))
    shares = PS.msm_shares(bases, stack)
    got = C.points_to_ints(C.to_affine(PS.combine(shares)))
    want = C.points_to_ints(C.to_affine(M.msm(bases, F.from_int(FR, coeffs))))
    assert got == want
