"""Binary/ring Rep3 shares: roundtrips, shared AND, a2b, b2a."""

import jax
import jax.numpy as jnp

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.parallel import binary as B
from co_zkvms_tpu.parallel import shares as S

FR = F.FR


def test_ring_and_bin_roundtrip(rng):
    xs = jnp.array([rng.randrange(1 << 32) for _ in range(16)], dtype=jnp.uint32)
    r = B.ring_share(jax.random.key(0), xs)
    assert jnp.array_equal(B.ring_combine(r), xs)
    b = B.bin_share(jax.random.key(1), xs)
    assert jnp.array_equal(B.bin_combine(b), xs)


def test_bin_ops(rng):
    xs = jnp.array([rng.randrange(1 << 32) for _ in range(32)], dtype=jnp.uint32)
    ys = jnp.array([rng.randrange(1 << 32) for _ in range(32)], dtype=jnp.uint32)
    bx = B.bin_share(jax.random.key(2), xs)
    by = B.bin_share(jax.random.key(3), ys)
    assert jnp.array_equal(B.bin_combine(B.bin_xor(bx, by)), xs ^ ys)
    zero = B.bin_zero_shares(jax.random.key(4), xs.shape)
    assert jnp.array_equal(B.bin_combine(zero), jnp.zeros_like(xs))
    got_and = B.bin_combine(B.bin_and(bx, by, zero))
    assert jnp.array_equal(got_and, xs & ys)
    assert jnp.array_equal(B.bin_combine(B.bin_not(bx)), ~xs)


def test_a2b(rng):
    xs = jnp.array(
        [rng.randrange(1 << 32) for _ in range(64)] + [0, 0xFFFFFFFF],
        dtype=jnp.uint32,
    )
    r = B.ring_share(jax.random.key(5), xs)
    b = B.a2b(r, jax.random.key(6))
    assert jnp.array_equal(B.bin_combine(b), xs)


def test_b2a_fr(rng):
    vals = [rng.randrange(1 << 32) for _ in range(8)]
    xs = jnp.array(vals, dtype=jnp.uint32)
    b = B.bin_share(jax.random.key(7), xs)
    fr = B.b2a_fr(b, jax.random.key(8))
    got = [int(v) for v in F.to_int(FR, S.combine(FR, fr))]
    assert got == vals


def test_a2b_b2a_chain(rng):
    vals = [rng.randrange(1 << 32) for _ in range(4)]
    xs = jnp.array(vals, dtype=jnp.uint32)
    r = B.ring_share(jax.random.key(9), xs)
    fr = B.b2a_fr(B.a2b(r, jax.random.key(10)), jax.random.key(11))
    got = [int(v) for v in F.to_int(FR, S.combine(FR, fr))]
    assert got == vals


def test_a2b64_roundtrip(rng):
    """Z_2^64 additive shares -> 64-bit binary shares (2-limb Kogge-Stone)."""
    import numpy as np

    from co_zkvms_tpu.parallel import ring as R

    xs = [rng.randrange(1 << 64) for _ in range(9)]
    r = R.share(R.U64R, jax.random.key(21), R.from_ints(R.U64R, xs))
    b = B.a2b64(r, jax.random.key(22))
    lo = np.asarray(jax.device_get(b[0] ^ b[1] ^ b[2]))
    got = [int(lo[i, 0]) | (int(lo[i, 1]) << 32) for i in range(len(xs))]
    assert got == xs


def test_b2a_bits_fr2_chain(rng):
    """a2b64 -> per-bit Fr shares recompose to the 64-bit value mod p."""
    from co_zkvms_tpu.parallel import ring as R

    xs = [rng.randrange(1 << 64) for _ in range(5)]
    r = R.share(R.U64R, jax.random.key(23), R.from_ints(R.U64R, xs))
    bits = B.b2a_bits_fr2(B.a2b64(r, jax.random.key(24)), 64)
    acc = None
    for j in range(64):
        term = F.mul_small(FR, bits[j], 1 << j)
        acc = term if acc is None else F.add(FR, acc, term)
    got = [int(v) for v in
           jax.device_get(F.to_int(FR, S.combine(FR, acc)))]
    assert got == [x % FR.modulus for x in xs]
