"""Fused Pallas kernels for batched G1 point operations.

A complete mixed addition through the jnp path is ~1900 separate XLA ops
(~18 field muls, each itself multi-op) — at MSM bucket widths the per-op
dispatch overhead dominates (measured: 21 s for a 2^16 MSM). These kernels
run the ENTIRE madd-2007-bl / dbl-2009-l formulas, edge-case selects
included, as one VMEM-resident Pallas program: one launch per point batch.

Bit-exact with ops/curve.py (tested); curve.add_mixed/double dispatch here
on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .field import FQ
from . import field_pallas as FP

BLK = FP.BLK


def _load(ref):
    return [ref[i, :] for i in range(16)]


def _store(ref, limbs):
    for i in range(16):
        ref[i, :] = limbs[i]


def _consts():
    m = [int(v) for v in FQ.mod_limbs]
    one = [int(v) for v in FQ.one_mont]
    return m, one, FQ.n0inv


def _double_limbs(px, py, pz, m, n0):
    """dbl-2009-l on limb-vector lists; returns (x, y, z)."""
    a = FP._msq(px, m, n0)
    b = FP._msq(py, m, n0)
    c = FP._msq(b, m, n0)
    xb = FP._madd(px, b, m)
    d = FP._mdbl(FP._msub(FP._msub(FP._msq(xb, m, n0), a, m), c, m), m)
    e = FP._madd(FP._mdbl(a, m), a, m)
    f = FP._msq(e, m, n0)
    x3 = FP._msub(f, FP._mdbl(d, m), m)
    c8 = FP._mdbl(FP._mdbl(FP._mdbl(c, m), m), m)
    y3 = FP._msub(FP._mm(e, FP._msub(d, x3, m), m, n0), c8, m)
    z3 = FP._mdbl(FP._mm(py, pz, m, n0), m)
    return x3, y3, z3


def _add_mixed_kernel(px_ref, py_ref, pz_ref, qx_ref, qy_ref,
                      ox_ref, oy_ref, oz_ref, mod, one, n0):
    m = list(mod)
    px, py, pz = _load(px_ref), _load(py_ref), _load(pz_ref)
    qx, qy = _load(qx_ref), _load(qy_ref)

    z1z1 = FP._msq(pz, m, n0)
    u2 = FP._mm(qx, z1z1, m, n0)
    s2 = FP._mm(qy, FP._mm(pz, z1z1, m, n0), m, n0)
    h = FP._msub(u2, px, m)
    r = FP._msub(s2, py, m)
    h_zero = FP._mis_zero(h)
    r_zero = FP._mis_zero(r)
    hh = FP._msq(h, m, n0)
    i = FP._mdbl(FP._mdbl(hh, m), m)
    j = FP._mm(h, i, m, n0)
    rr = FP._mdbl(r, m)
    v = FP._mm(px, i, m, n0)
    x3 = FP._msub(FP._msub(FP._msq(rr, m, n0), j, m), FP._mdbl(v, m), m)
    y3 = FP._msub(
        FP._mm(rr, FP._msub(v, x3, m), m, n0),
        FP._mdbl(FP._mm(py, j, m, n0), m), m,
    )
    zh = FP._madd(pz, h, m)
    z3 = FP._msub(FP._msub(FP._msq(zh, m, n0), z1z1, m), hh, m)

    dx, dy, dz = _double_limbs(px, py, pz, m, n0)

    zero = [jnp.zeros_like(px[0]) for _ in range(16)]
    onel = [jnp.full_like(px[0], o) for o in one]
    p_inf = FP._mis_zero(pz)
    q_inf = jnp.logical_and(FP._mis_zero(qx), FP._mis_zero(qy))
    both = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    eq_case = jnp.logical_and(jnp.logical_and(h_zero, r_zero), both)
    neg_case = jnp.logical_and(
        jnp.logical_and(h_zero, jnp.logical_not(r_zero)), both
    )

    rx = FP._msel(eq_case, dx, x3)
    ry = FP._msel(eq_case, dy, y3)
    rz = FP._msel(eq_case, dz, z3)
    rx = FP._msel(neg_case, onel, rx)
    ry = FP._msel(neg_case, onel, ry)
    rz = FP._msel(neg_case, zero, rz)
    rx = FP._msel(q_inf, px, rx)
    ry = FP._msel(q_inf, py, ry)
    rz = FP._msel(q_inf, pz, rz)
    # from_affine(q), honoring q == infinity
    fa_x = FP._msel(q_inf, onel, qx)
    fa_y = FP._msel(q_inf, onel, qy)
    fa_z = FP._msel(q_inf, zero, onel)
    rx = FP._msel(p_inf, fa_x, rx)
    ry = FP._msel(p_inf, fa_y, ry)
    rz = FP._msel(p_inf, fa_z, rz)
    _store(ox_ref, rx)
    _store(oy_ref, ry)
    _store(oz_ref, rz)


def _add_kernel(px_ref, py_ref, pz_ref, qx_ref, qy_ref, qz_ref,
                ox_ref, oy_ref, oz_ref, mod, one, n0):
    m = list(mod)
    px, py, pz = _load(px_ref), _load(py_ref), _load(pz_ref)
    qx, qy, qz = _load(qx_ref), _load(qy_ref), _load(qz_ref)

    z1z1 = FP._msq(pz, m, n0)
    z2z2 = FP._msq(qz, m, n0)
    u1 = FP._mm(px, z2z2, m, n0)
    u2 = FP._mm(qx, z1z1, m, n0)
    s1 = FP._mm(py, FP._mm(qz, z2z2, m, n0), m, n0)
    s2 = FP._mm(qy, FP._mm(pz, z1z1, m, n0), m, n0)
    h = FP._msub(u2, u1, m)
    r = FP._msub(s2, s1, m)
    h_zero = FP._mis_zero(h)
    r_zero = FP._mis_zero(r)
    h2 = FP._mdbl(h, m)
    i = FP._msq(h2, m, n0)
    j = FP._mm(h, i, m, n0)
    rr = FP._mdbl(r, m)
    v = FP._mm(u1, i, m, n0)
    x3 = FP._msub(FP._msub(FP._msq(rr, m, n0), j, m), FP._mdbl(v, m), m)
    y3 = FP._msub(
        FP._mm(rr, FP._msub(v, x3, m), m, n0),
        FP._mdbl(FP._mm(s1, j, m, n0), m), m,
    )
    zz = FP._madd(pz, qz, m)
    z3 = FP._mm(
        FP._msub(FP._msub(FP._msq(zz, m, n0), z1z1, m), z2z2, m),
        h, m, n0,
    )

    dx, dy, dz = _double_limbs(px, py, pz, m, n0)

    zero = [jnp.zeros_like(px[0]) for _ in range(16)]
    onel = [jnp.full_like(px[0], o) for o in one]
    p_inf = FP._mis_zero(pz)
    q_inf = FP._mis_zero(qz)
    both = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    eq_case = jnp.logical_and(jnp.logical_and(h_zero, r_zero), both)
    neg_case = jnp.logical_and(
        jnp.logical_and(h_zero, jnp.logical_not(r_zero)), both
    )

    rx = FP._msel(eq_case, dx, x3)
    ry = FP._msel(eq_case, dy, y3)
    rz = FP._msel(eq_case, dz, z3)
    rx = FP._msel(neg_case, onel, rx)
    ry = FP._msel(neg_case, onel, ry)
    rz = FP._msel(neg_case, zero, rz)
    rx = FP._msel(q_inf, px, rx)
    ry = FP._msel(q_inf, py, ry)
    rz = FP._msel(q_inf, pz, rz)
    rx = FP._msel(p_inf, qx, rx)
    ry = FP._msel(p_inf, qy, ry)
    rz = FP._msel(p_inf, qz, rz)
    _store(ox_ref, rx)
    _store(oy_ref, ry)
    _store(oz_ref, rz)


def _add_incomplete_kernel(px_ref, py_ref, pz_ref, qx_ref, qy_ref, qz_ref,
                           ox_ref, oy_ref, oz_ref, mod, n0):
    """Jacobian addition WITHOUT the doubling path (MSM merge trees only).

    Soundness of dropping p == q handling: every call site adds sums of
    DISJOINT subsets of the input points (suffix-scan partners, group-fold
    halves, sub-accumulator lanes). Two disjoint subset sums of fixed
    curve points colliding is a nontrivial discrete-log relation among the
    bases — for SRS/commitment bases that is cryptographically unreachable
    (the standard incomplete-addition argument, cf. halo2's MSM). If it
    ever did occur, h == 0 makes z3 == 0, i.e. the result degrades to the
    infinity encoding rather than an undetected wrong point. Infinity
    INPUTS (empty buckets, padding) are handled exactly.

    Saves the ~35% of kernel ops the fused complete add spends on
    _double_limbs + extra selects; general-purpose ``add`` stays complete.
    """
    m = list(mod)
    px, py, pz = _load(px_ref), _load(py_ref), _load(pz_ref)
    qx, qy, qz = _load(qx_ref), _load(qy_ref), _load(qz_ref)

    z1z1 = FP._msq(pz, m, n0)
    z2z2 = FP._msq(qz, m, n0)
    u1 = FP._mm(px, z2z2, m, n0)
    u2 = FP._mm(qx, z1z1, m, n0)
    s1 = FP._mm(py, FP._mm(qz, z2z2, m, n0), m, n0)
    s2 = FP._mm(qy, FP._mm(pz, z1z1, m, n0), m, n0)
    h = FP._msub(u2, u1, m)
    r = FP._msub(s2, s1, m)
    h2 = FP._mdbl(h, m)
    i = FP._msq(h2, m, n0)
    j = FP._mm(h, i, m, n0)
    rr = FP._mdbl(r, m)
    v = FP._mm(u1, i, m, n0)
    x3 = FP._msub(FP._msub(FP._msq(rr, m, n0), j, m), FP._mdbl(v, m), m)
    y3 = FP._msub(
        FP._mm(rr, FP._msub(v, x3, m), m, n0),
        FP._mdbl(FP._mm(s1, j, m, n0), m), m,
    )
    zz = FP._madd(pz, qz, m)
    z3 = FP._mm(
        FP._msub(FP._msub(FP._msq(zz, m, n0), z1z1, m), z2z2, m),
        h, m, n0,
    )

    p_inf = FP._mis_zero(pz)
    q_inf = FP._mis_zero(qz)
    rx = FP._msel(q_inf, px, x3)
    ry = FP._msel(q_inf, py, y3)
    rz = FP._msel(q_inf, pz, z3)
    rx = FP._msel(p_inf, qx, rx)
    ry = FP._msel(p_inf, qy, ry)
    rz = FP._msel(p_inf, qz, rz)
    _store(ox_ref, rx)
    _store(oy_ref, ry)
    _store(oz_ref, rz)


def _double_kernel(px_ref, py_ref, pz_ref, ox_ref, oy_ref, oz_ref, mod, n0):
    m = list(mod)
    px, py, pz = _load(px_ref), _load(py_ref), _load(pz_ref)
    dx, dy, dz = _double_limbs(px, py, pz, m, n0)
    _store(ox_ref, dx)
    _store(oy_ref, dy)
    _store(oz_ref, dz)


def _bucket_accum_kernel(qx_ref, qy_ref, bx_ref, by_ref, bz_ref,
                         ox_ref, oy_ref, oz_ref, mod, one, n0, n_rows):
    """MSM bucket accumulation with VMEM-resident buckets.

    Grid = (R,) rows of a dense (row, bucket) point layout; invalid slots
    are zero-encoded (q == (0,0) -> infinity -> no-op in the complete mixed
    add). Buckets live in scratch across all rows — points stream from HBM
    exactly once and no intermediate Jacobian state ever leaves VMEM, unlike
    the XLA while-loop path which round-trips [nw, nb] buckets per step.
    """
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        zeros = jnp.zeros_like(bx_ref[:])
        bx_ref[:] = zeros
        by_ref[:] = zeros
        bz_ref[:] = zeros

    m = list(mod)
    px, py, pz = _load(bx_ref), _load(by_ref), _load(bz_ref)
    qx, qy = _load(qx_ref), _load(qy_ref)

    # INCOMPLETE mixed add: the acc == q doubling case is dropped — the
    # accumulator is a partial sum of a DISJOINT subset of the input
    # points, so acc == q is a discrete-log relation among fixed bases
    # (unreachable for SRS/commitment inputs; see _add_incomplete_kernel).
    # acc == -q likewise. Both degrade to z3 == 0 (infinity), not a wrong
    # point. Infinity inputs (empty bucket, zero-padded slot) are exact.
    z1z1 = FP._msq(pz, m, n0)
    u2 = FP._mm(qx, z1z1, m, n0)
    s2 = FP._mm(qy, FP._mm(pz, z1z1, m, n0), m, n0)
    h = FP._msub(u2, px, m)
    r = FP._msub(s2, py, m)
    hh = FP._msq(h, m, n0)
    ii = FP._mdbl(FP._mdbl(hh, m), m)
    j = FP._mm(h, ii, m, n0)
    rr = FP._mdbl(r, m)
    v = FP._mm(px, ii, m, n0)
    x3 = FP._msub(FP._msub(FP._msq(rr, m, n0), j, m), FP._mdbl(v, m), m)
    y3 = FP._msub(
        FP._mm(rr, FP._msub(v, x3, m), m, n0),
        FP._mdbl(FP._mm(py, j, m, n0), m), m,
    )
    zh = FP._madd(pz, h, m)
    z3 = FP._msub(FP._msub(FP._msq(zh, m, n0), z1z1, m), hh, m)

    zero = [jnp.zeros_like(px[0]) for _ in range(16)]
    onel = [jnp.full_like(px[0], o) for o in one]
    p_inf = FP._mis_zero(pz)
    q_inf = jnp.logical_and(FP._mis_zero(qx), FP._mis_zero(qy))

    rx = FP._msel(q_inf, px, x3)
    ry = FP._msel(q_inf, py, y3)
    rz = FP._msel(q_inf, pz, z3)
    # from_affine(q), honoring q == infinity
    fa_x = FP._msel(q_inf, onel, qx)
    fa_y = FP._msel(q_inf, onel, qy)
    fa_z = FP._msel(q_inf, zero, onel)
    rx = FP._msel(p_inf, fa_x, rx)
    ry = FP._msel(p_inf, fa_y, ry)
    rz = FP._msel(p_inf, fa_z, rz)
    _store(bx_ref, rx)
    _store(by_ref, ry)
    _store(bz_ref, rz)

    @pl.when(i == n_rows - 1)
    def _():
        ox_ref[:] = bx_ref[:]
        oy_ref[:] = by_ref[:]
        oz_ref[:] = bz_ref[:]


@functools.partial(jax.jit, static_argnums=(2,))
def bucket_accumulate(qx_grid, qy_grid, nb: int):
    """Accumulate a dense [R, 16, nb] point grid into nb VMEM buckets.

    Returns Jacobian bucket coords as three [16, nb] u32 arrays. Column b of
    every row adds into bucket b; zero-encoded slots are skipped by the
    complete-add infinity case.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r_rows = qx_grid.shape[0]
    mod, one, n0 = _consts()
    kernel = functools.partial(
        _bucket_accum_kernel, mod=tuple(mod), one=tuple(one), n0=n0,
        n_rows=r_rows,
    )
    in_spec = pl.BlockSpec((1, 16, nb), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((16, nb), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    ox, oy, oz = pl.pallas_call(
        lambda qx, qy, ox, oy, oz, bx, by, bz: kernel(
            qx.at[0], qy.at[0], bx, by, bz, ox, oy, oz),
        grid=(r_rows,),
        in_specs=[in_spec, in_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((16, nb), jnp.uint32) for _ in range(3)
        ),
        scratch_shapes=[
            pltpu.VMEM((16, nb), jnp.uint32) for _ in range(3)
        ],
        interpret=jax.default_backend() != "tpu",
    )(qx_grid, qy_grid)
    return ox, oy, oz


def _call(kernel, n_in, args, n):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bspec = pl.BlockSpec((16, BLK), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // BLK,),
        in_specs=[bspec] * n_in,
        out_specs=(bspec, bspec, bspec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((16, n), jnp.uint32) for _ in range(3)
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def _to_t(arr, shape, n_pad):
    flat = jnp.broadcast_to(arr, shape + (16,)).reshape(-1, 16)
    n = flat.shape[0]
    if n_pad != n:
        flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    return flat.T


@jax.jit
def add_mixed(p, q):
    """Batched complete mixed add via one fused kernel. Shapes as curve.py."""
    shape = jnp.broadcast_shapes(
        p.x.shape[:-1], p.y.shape[:-1], p.z.shape[:-1],
        q.x.shape[:-1], q.y.shape[:-1],
    )
    n = 1
    for d in shape:
        n *= d
    n_pad = max(-(-n // BLK) * BLK, BLK)
    mod, one, n0 = _consts()
    kernel = functools.partial(_add_mixed_kernel, mod=tuple(mod),
                               one=tuple(one), n0=n0)
    args = [_to_t(a, shape, n_pad)
            for a in (p.x, p.y, p.z, q.x, q.y)]
    ox, oy, oz = _call(kernel, 5, args, n_pad)
    from .curve import JPoint

    return JPoint(
        ox.T[:n].reshape(shape + (16,)),
        oy.T[:n].reshape(shape + (16,)),
        oz.T[:n].reshape(shape + (16,)),
    )


@jax.jit
def add(p, q):
    """Batched complete Jacobian addition via one fused kernel."""
    shape = jnp.broadcast_shapes(p.x.shape[:-1], q.x.shape[:-1])
    n = 1
    for d in shape:
        n *= d
    n_pad = max(-(-n // BLK) * BLK, BLK)
    mod, one, n0 = _consts()
    kernel = functools.partial(_add_kernel, mod=tuple(mod), one=tuple(one),
                               n0=n0)
    args = [_to_t(a, shape, n_pad)
            for a in (p.x, p.y, p.z, q.x, q.y, q.z)]
    ox, oy, oz = _call(kernel, 6, args, n_pad)
    from .curve import JPoint

    return JPoint(
        ox.T[:n].reshape(shape + (16,)),
        oy.T[:n].reshape(shape + (16,)),
        oz.T[:n].reshape(shape + (16,)),
    )


@jax.jit
def add_incomplete(p, q):
    """Batched Jacobian add WITHOUT the p == q doubling path — for MSM
    merge trees over disjoint subset sums only (see _add_incomplete_kernel
    for the soundness argument). Infinity inputs handled exactly."""
    shape = jnp.broadcast_shapes(p.x.shape[:-1], q.x.shape[:-1])
    n = 1
    for d in shape:
        n *= d
    n_pad = max(-(-n // BLK) * BLK, BLK)
    mod, one, n0 = _consts()
    kernel = functools.partial(_add_incomplete_kernel, mod=tuple(mod), n0=n0)
    args = [_to_t(a, shape, n_pad)
            for a in (p.x, p.y, p.z, q.x, q.y, q.z)]
    ox, oy, oz = _call(kernel, 6, args, n_pad)
    from .curve import JPoint

    return JPoint(
        ox.T[:n].reshape(shape + (16,)),
        oy.T[:n].reshape(shape + (16,)),
        oz.T[:n].reshape(shape + (16,)),
    )


@jax.jit
def double(p):
    """Batched Jacobian doubling via one fused kernel."""
    shape = p.x.shape[:-1]
    n = 1
    for d in shape:
        n *= d
    n_pad = max(-(-n // BLK) * BLK, BLK)
    mod, one, n0 = _consts()
    kernel = functools.partial(_double_kernel, mod=tuple(mod), n0=n0)
    args = [_to_t(a, shape, n_pad) for a in (p.x, p.y, p.z)]
    ox, oy, oz = _call(kernel, 3, args, n_pad)
    from .curve import JPoint

    return JPoint(
        ox.T[:n].reshape(shape + (16,)),
        oy.T[:n].reshape(shape + (16,)),
        oz.T[:n].reshape(shape + (16,)),
    )
