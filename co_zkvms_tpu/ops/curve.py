"""Batched BN254 G1 arithmetic in Jacobian coordinates on TPU limb vectors.

The unit of work is a *batch of points*: coordinates are uint32 limb arrays
``[..., 16]`` over Fq (Montgomery form), so every group operation is a fixed
straight-line sequence of vectorized field ops — no data-dependent branches
(edge cases resolve via selects), which is exactly what XLA/TPU wants.

Point encodings:
- Jacobian ``JPoint(x, y, z)``: affine = (x/z^2, y/z^3); infinity = z == 0
  (canonically (1, 1, 0) in Montgomery form).
- Affine ``APoint(x, y)``: infinity = (0, 0) (not on y^2 = x^3 + 3).

Replaces the reference's arkworks ``ark-ec`` BN254 G1 backend (SURVEY.md §0);
formulas are the standard a=0 Jacobian add/double/madd chains.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import field as F
from .field import FQ


class JPoint(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array


class APoint(NamedTuple):
    x: jax.Array
    y: jax.Array


def _mul(a, b):
    return F.mul(FQ, a, b)


def _sq(a):
    return F.mul(FQ, a, a)


def _add(a, b):
    return F.add(FQ, a, b)


def _sub(a, b):
    return F.sub(FQ, a, b)


def _dbl(a):
    return F.add(FQ, a, a)


def _is_zero(a):
    return jnp.all(a == 0, axis=-1)


def _sel(mask, p, q):
    """Pointwise select between two equally-shaped point pytrees."""
    return jax.tree.map(lambda a, b: F._select(mask, a, b), p, q)


def infinity(shape=()) -> JPoint:
    one = F.ones_mont(FQ, shape)
    return JPoint(one, one, F.zeros(shape))


def is_infinity(p: JPoint):
    return _is_zero(p.z)


def affine_is_infinity(p: APoint):
    return jnp.logical_and(_is_zero(p.x), _is_zero(p.y))


def from_affine(p: APoint) -> JPoint:
    inf = affine_is_infinity(p)
    one = F.ones_mont(FQ, p.x.shape[:-1])
    j = JPoint(p.x, p.y, one)
    return _sel(inf, infinity(p.x.shape[:-1]), j)


def neg(p: JPoint) -> JPoint:
    return JPoint(p.x, F.neg(FQ, p.y), p.z)


@jax.jit
def double(p: JPoint) -> JPoint:
    """Jacobian doubling (dbl-2009-l, a=0): 2M + 5S per point."""
    if _batch_of(p.x.shape[:-1]) >= 16 and jax.default_backend() == "tpu":
        from . import curve_pallas

        return curve_pallas.double(p)
    a = _sq(p.x)
    b = _sq(p.y)
    c = _sq(b)
    d = _dbl(_sub(_sub(_sq(_add(p.x, b)), a), c))
    e = _add(_dbl(a), a)  # 3a
    f = _sq(e)
    x3 = _sub(f, _dbl(d))
    y3 = _sub(_mul(e, _sub(d, x3)), _dbl(_dbl(_dbl(c))))  # 8c
    z3 = _dbl(_mul(p.y, p.z))
    return JPoint(x3, y3, z3)


@jax.jit
def add(p: JPoint, q: JPoint) -> JPoint:
    """Complete Jacobian addition (add-2007-bl + edge-case selects).

    TPU + batch >= 16 dispatches to the fused Pallas kernel (bit-exact)."""
    if _batch_of(jnp.broadcast_shapes(p.x.shape[:-1], q.x.shape[:-1])) >= 16 \
            and jax.default_backend() == "tpu":
        from . import curve_pallas

        return curve_pallas.add(p, q)
    z1z1 = _sq(p.z)
    z2z2 = _sq(q.z)
    u1 = _mul(p.x, z2z2)
    u2 = _mul(q.x, z1z1)
    s1 = _mul(p.y, _mul(q.z, z2z2))
    s2 = _mul(q.y, _mul(p.z, z1z1))
    h = _sub(u2, u1)
    r = _sub(s2, s1)
    h_zero = _is_zero(h)
    r_zero = _is_zero(r)
    i = _sq(_dbl(h))
    j = _mul(h, i)
    rr = _dbl(r)
    v = _mul(u1, i)
    x3 = _sub(_sub(_sq(rr), j), _dbl(v))
    y3 = _sub(_mul(rr, _sub(v, x3)), _dbl(_mul(s1, j)))
    z3 = _mul(h, _sub(_sq(_add(p.z, q.z)), _add(z1z1, z2z2)))
    generic = JPoint(x3, y3, z3)

    p_inf = is_infinity(p)
    q_inf = is_infinity(q)
    both = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    eq_case = jnp.logical_and(jnp.logical_and(h_zero, r_zero), both)
    neg_case = jnp.logical_and(jnp.logical_and(h_zero, jnp.logical_not(r_zero)), both)

    res = _sel(eq_case, double(p), generic)
    res = _sel(neg_case, infinity(p.x.shape[:-1]), res)
    res = _sel(q_inf, p, res)
    res = _sel(p_inf, q, res)
    return res


def _batch_of(shape):
    n = 1
    for d in shape:
        n *= d
    return n


@jax.jit
def add_mixed(p: JPoint, q: APoint) -> JPoint:
    """Complete mixed addition Jacobian + affine (madd-2007-bl).

    TPU + batch >= 16 dispatches to the fused Pallas kernel (bit-exact)."""
    if _batch_of(p.x.shape[:-1]) >= 16 and jax.default_backend() == "tpu":
        from . import curve_pallas

        return curve_pallas.add_mixed(p, q)
    z1z1 = _sq(p.z)
    u2 = _mul(q.x, z1z1)
    s2 = _mul(q.y, _mul(p.z, z1z1))
    h = _sub(u2, p.x)
    r = _sub(s2, p.y)
    h_zero = _is_zero(h)
    r_zero = _is_zero(r)
    hh = _sq(h)
    i = _dbl(_dbl(hh))
    j = _mul(h, i)
    rr = _dbl(r)
    v = _mul(p.x, i)
    x3 = _sub(_sub(_sq(rr), j), _dbl(v))
    y3 = _sub(_mul(rr, _sub(v, x3)), _dbl(_mul(p.y, j)))
    z3 = _sub(_sub(_sq(_add(p.z, h)), z1z1), hh)
    generic = JPoint(x3, y3, z3)

    p_inf = is_infinity(p)
    q_inf = affine_is_infinity(q)
    both = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    eq_case = jnp.logical_and(jnp.logical_and(h_zero, r_zero), both)
    neg_case = jnp.logical_and(jnp.logical_and(h_zero, jnp.logical_not(r_zero)), both)

    res = _sel(eq_case, double(p), generic)
    res = _sel(neg_case, infinity(p.x.shape[:-1]), res)
    res = _sel(q_inf, p, res)
    res = _sel(p_inf, from_affine(q), res)
    return res


@jax.jit
def to_affine(p: JPoint) -> APoint:
    """Batch-normalize Jacobian -> affine. Infinity maps to (0, 0).

    Uses one batched inversion over the flattened batch (Montgomery trick).
    """
    batch_shape = p.z.shape[:-1]
    z_flat = p.z.reshape(-1, F.NLIMBS)
    zinv = F.batch_inv(FQ, z_flat).reshape(p.z.shape)
    zinv2 = _sq(zinv)
    zinv3 = _mul(zinv2, zinv)
    return APoint(_mul(p.x, zinv2), _mul(p.y, zinv3))


def tree_sum(p: JPoint) -> JPoint:
    """Sum a batch of Jacobian points over the leading axis, log-depth.

    Returns a batch of size 1. Odd tails fold into lane 0 of each level.
    """
    n = p.x.shape[0]
    if n == 0:
        return infinity((1,))
    while n > 1:
        half = n // 2
        lo = JPoint(p.x[:half], p.y[:half], p.z[:half])
        hi = JPoint(p.x[half : 2 * half], p.y[half : 2 * half], p.z[half : 2 * half])
        merged = add(lo, hi)
        if n % 2:
            tail = JPoint(p.x[-1:], p.y[-1:], p.z[-1:])
            first = JPoint(merged.x[:1], merged.y[:1], merged.z[:1])
            folded = add(first, tail)
            merged = JPoint(
                jnp.concatenate([folded.x, merged.x[1:]]),
                jnp.concatenate([folded.y, merged.y[1:]]),
                jnp.concatenate([folded.z, merged.z[1:]]),
            )
        p = merged
        n = half
    return p


# --- host <-> device conversion --------------------------------------------


def points_from_ints(xy_list) -> APoint:
    """List of (x, y) int pairs (0,0 = infinity) -> device APoint batch."""
    xs = F.from_int(FQ, [x for x, _ in xy_list])
    ys = F.from_int(FQ, [y for _, y in xy_list])
    return APoint(xs, ys)


def points_to_ints(p: APoint):
    """Device APoint batch -> list of (x, y) int pairs."""
    xs = F.to_int(FQ, p.x)
    ys = F.to_int(FQ, p.y)
    import numpy as np

    xs = np.atleast_1d(xs)
    ys = np.atleast_1d(ys)
    return [(int(a), int(b)) for a, b in zip(xs, ys)]
