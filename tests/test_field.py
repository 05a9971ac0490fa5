"""Bit-exact conformance of the TPU limb field kernels vs Python ints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from co_zkvms_tpu.ops import field as F


SPECS = [F.FR, F.FQ]


def rand_ints(rng, spec, n):
    return [rng.randrange(spec.modulus) for _ in range(n)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_roundtrip(spec, rng):
    xs = rand_ints(rng, spec, 8) + [0, 1, spec.modulus - 1]
    limbs = F.from_int(spec, xs)
    back = F.to_int(spec, limbs)
    assert list(back) == xs


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec, rng):
    n = 32
    a = rand_ints(rng, spec, n)
    b = rand_ints(rng, spec, n)
    la, lb = F.from_int(spec, a), F.from_int(spec, b)
    assert list(F.to_int(spec, F.add(spec, la, lb))) == [
        (x + y) % spec.modulus for x, y in zip(a, b)
    ]
    assert list(F.to_int(spec, F.sub(spec, la, lb))) == [
        (x - y) % spec.modulus for x, y in zip(a, b)
    ]
    assert list(F.to_int(spec, F.neg(spec, la))) == [(-x) % spec.modulus for x in a]
    zero = F.zeros((2,))
    assert list(F.to_int(spec, F.neg(spec, zero), mont=False)) == [0, 0]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul(spec, rng):
    n = 64
    a = rand_ints(rng, spec, n) + [0, 1, spec.modulus - 1, spec.modulus - 1]
    b = rand_ints(rng, spec, n) + [1, 0, spec.modulus - 1, 1]
    la, lb = F.from_int(spec, a), F.from_int(spec, b)
    got = list(F.to_int(spec, F.mul(spec, la, lb)))
    want = [(x * y) % spec.modulus for x, y in zip(a, b)]
    assert got == want


def test_mul_jit_matches_eager(rng):
    spec = F.FR
    a = F.from_int(spec, rand_ints(rng, spec, 16))
    b = F.from_int(spec, rand_ints(rng, spec, 16))
    eager = F.mul(spec, a, b)
    jitted = jax.jit(lambda x, y: F.mul(spec, x, y))(a, b)
    assert jnp.array_equal(eager, jitted)


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_inv_and_pow(spec, rng):
    xs = rand_ints(rng, spec, 8) + [1, spec.modulus - 1]
    la = F.from_int(spec, xs)
    inv = F.inv(spec, la)
    got = list(F.to_int(spec, inv))
    want = [pow(x, -1, spec.modulus) for x in xs]
    assert got == want
    # pow_const
    e = 12345
    got_p = list(F.to_int(spec, F.pow_const(spec, la, e)))
    assert got_p == [pow(x, e, spec.modulus) for x in xs]


def test_batch_inv(rng):
    spec = F.FR
    xs = rand_ints(rng, spec, 33)
    xs[5] = 0  # zero maps to zero
    la = F.from_int(spec, xs)
    got = list(F.to_int(spec, F.batch_inv(spec, la)))
    want = [pow(x, -1, spec.modulus) if x else 0 for x in xs]
    assert got == want


def test_mul_small(rng):
    spec = F.FR
    xs = rand_ints(rng, spec, 4)
    la = F.from_int(spec, xs)
    for k in [0, 1, 2, 3, 7, 255]:
        got = list(np.atleast_1d(F.to_int(spec, F.mul_small(spec, la, k))))
        assert got == [(x * k) % spec.modulus for x in xs]


def test_random_uniform_range():
    spec = F.FR
    key = jax.random.key(0)
    r = F.random(spec, key, (64,))
    vals = F.to_int(spec, r)
    assert all(0 <= int(v) < spec.modulus for v in vals)
    # extremely unlikely to collide
    assert len(set(int(v) for v in vals)) == 64


def test_from_int_shapes():
    spec = F.FR
    arr = F.from_int(spec, [[1, 2], [3, 4]])
    assert arr.shape == (2, 2, F.NLIMBS)
    back = F.to_int(spec, arr)
    assert back.tolist() == [[1, 2], [3, 4]]


def test_pallas_square_kernel_matches_mul():
    """_msq (interpret mode) bit-equals mul(a, a) on random batches."""
    import jax

    from co_zkvms_tpu.ops import field_pallas as FP

    a = F.random(F.FR, jax.random.key(9), (64,))
    got = FP.square(F.FR, a)
    want = F.mul(F.FR, a, a)
    assert jnp.array_equal(got, want)
