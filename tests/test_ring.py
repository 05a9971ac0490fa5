"""Generic Z_2^k Rep3 ring shares (rep3_ring parity: ring widths + Bit)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from co_zkvms_tpu.parallel import ring as R

WIDTHS = [R.BIT, R.U8R, R.U16R, R.U32R, RingSpec24 := R.RingSpec(24),
          R.U64R, R.RingSpec(48)]


@pytest.mark.parametrize("spec", WIDTHS, ids=lambda s: f"k{s.k}")
def test_share_combine_roundtrip(spec):
    rng = random.Random(spec.k)
    vals = [rng.randrange(1 << spec.k) for _ in range(37)]
    x = R.from_ints(spec, vals)
    sh = R.share(spec, jax.random.key(1), x)
    assert list(R.to_ints(spec, R.combine(spec, sh))) == vals


@pytest.mark.parametrize("spec", WIDTHS, ids=lambda s: f"k{s.k}")
def test_ring_arithmetic(spec):
    rng = random.Random(100 + spec.k)
    m = 1 << spec.k
    a = [rng.randrange(m) for _ in range(23)]
    b = [rng.randrange(m) for _ in range(23)]
    xa, xb = R.from_ints(spec, a), R.from_ints(spec, b)
    assert list(R.to_ints(spec, R.add(spec, xa, xb))) == [
        (u + v) % m for u, v in zip(a, b)]
    assert list(R.to_ints(spec, R.sub(spec, xa, xb))) == [
        (u - v) % m for u, v in zip(a, b)]
    assert list(R.to_ints(spec, R.mul_elems(spec, xa, xb))) == [
        (u * v) % m for u, v in zip(a, b)]
    s = min(spec.k - 1, 13) if spec.k > 1 else 0
    assert list(R.to_ints(spec, R.shl(spec, xa, s))) == [
        (u << s) % m for u, v in zip(a, b)]


@pytest.mark.parametrize("spec", [R.U16R, R.U64R], ids=lambda s: f"k{s.k}")
def test_shared_mul_and_publics(spec):
    rng = random.Random(7)
    m = 1 << spec.k
    a = [rng.randrange(m) for _ in range(16)]
    b = [rng.randrange(m) for _ in range(16)]
    c = rng.randrange(m)
    key = jax.random.key(3)
    k1, k2, k3 = jax.random.split(key, 3)
    sa = R.share(spec, k1, R.from_ints(spec, a))
    sb = R.share(spec, k2, R.from_ints(spec, b))
    zero = R.zero_shares(spec, k3, (16,))
    assert list(R.to_ints(spec, R.combine(spec, zero))) == [0] * 16
    prod = R.mul_shares(spec, sa, sb, zero=zero)
    assert list(R.to_ints(spec, R.combine(spec, prod))) == [
        (u * v) % m for u, v in zip(a, b)]
    cb = R.from_ints(spec, [c] * 16) if spec.lanes == 2 else \
        R.from_ints(spec, c)
    got = R.combine(spec, R.add_public(spec, sa, cb))
    assert list(R.to_ints(spec, got)) == [(u + c) % m for u in a]
    got = R.combine(spec, R.mul_public(spec, sa, cb))
    assert list(R.to_ints(spec, got)) == [(u * c) % m for u in a]


def test_bit_type():
    rng = random.Random(9)
    a = [rng.randrange(2) for _ in range(64)]
    b = [rng.randrange(2) for _ in range(64)]
    k1, k2, k3 = jax.random.split(jax.random.key(5), 3)
    sa = R.share(R.BIT, k1, R.from_ints(R.BIT, a))
    sb = R.share(R.BIT, k2, R.from_ints(R.BIT, b))
    assert list(R.to_ints(R.BIT, R.combine(R.BIT, R.bit_xor(sa, sb)))) == [
        u ^ v for u, v in zip(a, b)]
    zero = R.zero_shares(R.BIT, k3, (64,))
    got = R.combine(R.BIT, R.bit_and(sa, sb, zero=zero))
    assert list(R.to_ints(R.BIT, got)) == [u & v for u, v in zip(a, b)]
    assert list(R.to_ints(R.BIT, R.combine(R.BIT, R.bit_not(sa)))) == [
        1 - u for u in a]


def test_cast_truncates_shares_exactly():
    rng = random.Random(11)
    vals = [rng.randrange(1 << 64) for _ in range(19)]
    sh = R.share(R.U64R, jax.random.key(2), R.from_ints(R.U64R, vals))
    for dst in (R.U32R, R.U16R, R.BIT):
        low = R.cast(R.U64R, dst, sh)
        assert list(R.to_ints(dst, R.combine(dst, low))) == [
            v % (1 << dst.k) for v in vals]
    with pytest.raises(ValueError):
        R.cast(R.U16R, R.U32R, sh)
