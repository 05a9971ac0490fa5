"""Native C++ pairing verifier vs the pure-Python oracle."""

import random

import pytest

from co_zkvms_tpu.ops import ref_bn254 as bn
from co_zkvms_tpu.utils import native_pairing as NP

pytestmark = pytest.mark.skipif(
    not NP.available(), reason="native toolchain unavailable"
)


def _rand_pts(seed, n=3):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        a = rng.randrange(1, bn.R_ORDER)
        b = rng.randrange(1, bn.R_ORDER)
        out.append((bn.scalar_mul(bn.G1_GEN, a), bn.scalar_mul(bn.G2_GEN, b)))
    return out


def test_single_pairing_bit_equal():
    for seed in (1, 2):
        (p, q), = _rand_pts(seed, 1)
        assert NP.pairing_coeffs(p, q) == tuple(bn.pairing(q, p).coeffs)


def test_bilinearity_product():
    rng = random.Random(5)
    a = rng.randrange(1, bn.R_ORDER)
    b = rng.randrange(1, bn.R_ORDER)
    pa = bn.scalar_mul(bn.G1_GEN, a)
    qb = bn.scalar_mul(bn.G2_GEN, b)
    pab = bn.scalar_mul(bn.G1_GEN, a * b % bn.R_ORDER)
    assert NP.multi_pairing_is_one([(pa, qb), (bn.neg_pt(pab), bn.G2_GEN)])
    assert not NP.multi_pairing_is_one([(pa, qb), (pab, bn.G2_GEN)])


def test_multi_product_matches_oracle():
    pts = _rand_pts(9, 3)
    # make the product trivially one by pairing each with its inverse
    pairs = []
    for p, q in pts:
        pairs.append((p, q))
        pairs.append((bn.neg_pt(p), q))
    assert NP.multi_pairing_is_one(pairs)
    assert bn.multi_pairing_is_one_py(pairs)
    # drop one inverse -> both sides reject
    assert not NP.multi_pairing_is_one(pairs[:-1])
    assert not bn.multi_pairing_is_one_py(pairs[:-1])


def test_infinity_handling():
    (p, q), = _rand_pts(11, 1)
    # e(inf, Q) == 1 == e(P, inf)
    assert NP.multi_pairing_is_one([(None, q)])
    assert NP.multi_pairing_is_one([(p, None)])
    assert NP.pairing_coeffs(None, q) == tuple(bn.FQ12.one().coeffs)


def test_dispatch_agrees_with_py():
    pts = _rand_pts(13, 2)
    pairs = [(p, q) for p, q in pts] + [
        (bn.neg_pt(pts[0][0]), pts[0][1]),
        (bn.neg_pt(pts[1][0]), pts[1][1]),
    ]
    assert bn.multi_pairing_is_one(pairs) == bn.multi_pairing_is_one_py(pairs)
