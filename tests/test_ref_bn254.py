"""Sanity of the pure-Python BN254 ground truth (curve + pairing)."""

import pytest

from co_zkvms_tpu.ops import ref_bn254 as bn


def test_generators_on_curve():
    assert bn.is_on_curve(bn.G1_GEN, bn.B1)
    assert bn.is_on_curve(bn.G2_GEN, bn.B2)


def test_g1_group_ops():
    g = bn.G1_GEN
    assert bn.add(g, bn.neg_pt(g)) is None
    assert bn.scalar_mul(g, bn.R_ORDER) is None
    p2 = bn.double(g)
    p3 = bn.add(p2, g)
    assert bn.scalar_mul(g, 3) == p3
    # distributivity
    assert bn.add(bn.scalar_mul(g, 5), bn.scalar_mul(g, 7)) == bn.scalar_mul(g, 12)


def test_g2_group_ops():
    h = bn.G2_GEN
    assert bn.scalar_mul(h, bn.R_ORDER) is None
    assert bn.add(bn.scalar_mul(h, 3), bn.scalar_mul(h, 4)) == bn.scalar_mul(h, 7)


@pytest.mark.slow
def test_pairing_bilinear():
    g, h = bn.G1_GEN, bn.G2_GEN
    # e(2g, 3h) == e(g, h)^6 == e(6g, h)
    lhs = bn.pairing(bn.scalar_mul(h, 3), bn.scalar_mul(g, 2))
    rhs = bn.pairing(h, bn.scalar_mul(g, 6))
    assert lhs == rhs
    # multi-pairing: e(2g, h) * e(-2g, h) == 1
    assert bn.multi_pairing_is_one(
        [(bn.scalar_mul(g, 2), h), (bn.neg_pt(bn.scalar_mul(g, 2)), h)]
    )
