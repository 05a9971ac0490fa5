"""NTT: host ground truth, round-trips, convolution, meshed four-step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import ntt as N
from co_zkvms_tpu.ops.field import FR


def _host_ntt(vals, w, r):
    n = len(vals)
    return [sum(v * pow(w, (i * k) % n, r) for i, v in enumerate(vals)) % r
            for k in range(n)]


def test_root_of_unity_orders():
    for log_n in (1, 4, 10):
        w = N.two_adic_root(FR, log_n)
        assert pow(w, 1 << log_n, FR.modulus) == 1
        if log_n:
            assert pow(w, 1 << (log_n - 1), FR.modulus) != 1
    wi = N.two_adic_root(FR, 6, inverse=True)
    w = N.two_adic_root(FR, 6)
    assert w * wi % FR.modulus == 1


def test_ntt_matches_host_dft():
    log_n = 4
    n = 1 << log_n
    rng = np.random.default_rng(0)
    vals = [int(v) for v in rng.integers(0, 1 << 62, n)]
    w = N.two_adic_root(FR, log_n)
    expect = _host_ntt(vals, w, FR.modulus)
    x = F.from_int(FR, vals)
    out = N.ntt(FR, x)
    got = [F.to_int(FR, out[i]) for i in range(n)]
    assert got == expect


def test_ntt_intt_roundtrip():
    log_n = 10
    n = 1 << log_n
    x = F.random(FR, jax.random.key(3), (n,))
    back = N.intt(FR, N.ntt(FR, x))
    assert jnp.array_equal(back, x)


def test_ntt_batched_axis():
    x = F.random(FR, jax.random.key(5), (3, 8))
    out = N.ntt(FR, x)
    for i in range(3):
        assert jnp.array_equal(out[i], N.ntt(FR, x[i]))


def test_polynomial_convolution():
    # (1 + 2t)(3 + 4t) = 3 + 10t + 8t^2 over a length-8 domain
    r = FR.modulus
    a = F.from_int(FR, [1, 2, 0, 0, 0, 0, 0, 0])
    b = F.from_int(FR, [3, 4, 0, 0, 0, 0, 0, 0])
    prod = N.mul_polys(FR, a, b)
    got = [F.to_int(FR, prod[i]) for i in range(8)]
    assert got == [3, 10, 8, 0, 0, 0, 0, 0]


@pytest.mark.parametrize("log_n", [6, 9])
@pytest.mark.parametrize("inverse", [False, True])
def test_ntt_mesh_matches_single(log_n, inverse):
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from jax.sharding import Mesh

    mesh = Mesh(np.array(devs[:8]), ("x",))
    n = 1 << log_n
    x = F.random(FR, jax.random.key(7), (n,))
    single = N.ntt(FR, x, inverse=inverse)
    meshed = N.ntt_mesh(FR, x, mesh, "x", inverse=inverse)
    assert jnp.array_equal(jax.device_get(meshed), jax.device_get(single))
