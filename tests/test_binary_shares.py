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
