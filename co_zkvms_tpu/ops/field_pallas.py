"""Pallas TPU kernels for BN254 field arithmetic (limb-major, VPU-resident).

The jnp limb path (field.py) lowers to ~80 separate HBM-streaming XLA ops
per modmul — measured ~0.2 s for 2^20 elements on v5e (HBM-bound, bad u32
layouts). This kernel keeps the entire 16x16 schoolbook product + Montgomery
REDC + carry chains in VMEM registers: one HBM read per operand, one write
per result, fully unrolled straight-line uint32 vector code on the VPU.

Layout inside the kernel is limb-major ([16, BLK]): each limb row is a
contiguous lane-aligned vector. Callers keep the framework-wide [..., 16]
layout; transposes at the boundary are fused by XLA.

Bit-exact with field.mul (tested); enabled automatically on TPU for large
batches via field.mul's dispatch hook.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import field as F

import os

# elements per grid step (16 limb rows x BLK u32 lanes resident in VMEM).
# 2048 amortizes the ~1 us/step grid overhead that dominated the r3 bench
# (2^20 mul = 2048 steps at BLK=512); env-tunable for the probe sweep.
BLK = int(os.environ.get("COZK_FP_BLK", "2048"))

MASK = 0xFFFF  # python ints only inside the kernel: pallas forbids captured
SIXTEEN = 16   # traced constants


# --- limb-vector helpers (operate on lists of 16 [BLK] u32 vectors) ---------


def _cond_sub_m(res, carry, m):
    """res (canonical digits) + carry flag -> res mod m (one subtract)."""
    borrow = None
    diff = []
    for k in range(16):
        v = res[k] - m[k] - (0 if borrow is None else borrow)
        diff.append(v & MASK)
        borrow = (v >> 31) & 1
    if carry is None:
        take = jnp.logical_not(borrow.astype(bool))
    else:
        take = jnp.logical_or(
            carry.astype(bool), jnp.logical_not(borrow.astype(bool))
        )
    return [jnp.where(take, d, r) for d, r in zip(diff, res)]


def _redc_cols(cols, m, n0):
    """Carry-canonicalize 32 loose columns, then Montgomery-reduce."""
    carry = None
    for k in range(32):
        v = cols[k] if carry is None else cols[k] + carry
        cols[k] = v & MASK
        carry = v >> SIXTEEN
    for i in range(16):
        mi = (cols[i] * n0) & MASK
        for j in range(16):
            p = mi * m[j]
            cols[i + j] = cols[i + j] + (p & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (p >> SIXTEEN)
        cols[i + 1] = cols[i + 1] + (cols[i] >> SIXTEEN)
    res = []
    carry = None
    for k in range(16, 32):
        v = cols[k] if carry is None else cols[k] + carry
        res.append(v & MASK)
        carry = v >> SIXTEEN
    return _cond_sub_m(res, carry, m)


def _mm(a, b, m, n0):
    """Montgomery product of limb-vector lists."""
    cols = [None] * 32
    for i in range(16):
        for j in range(16):
            p = a[i] * b[j]
            lo = p & MASK
            hi = p >> SIXTEEN
            k = i + j
            cols[k] = lo if cols[k] is None else cols[k] + lo
            cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    return _redc_cols(cols, m, n0)


def _msq(a, m, n0):
    """Montgomery square: 136 limb products instead of 256 (cross terms
    doubled after the lo/hi split, so columns stay < 2^22)."""
    cols = [None] * 32

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(16):
        p = a[i] * a[i]
        acc(2 * i, p & MASK)
        acc(2 * i + 1, p >> SIXTEEN)
        for j in range(i + 1, 16):
            p = a[i] * a[j]
            acc(i + j, (p & MASK) << 1)
            acc(i + j + 1, (p >> SIXTEEN) << 1)
    return _redc_cols(cols, m, n0)


def _madd(a, b, m):
    """(a + b) mod m on limb-vector lists."""
    s = []
    carry = None
    for k in range(16):
        v = a[k] + b[k] + (0 if carry is None else carry)
        s.append(v & MASK)
        carry = v >> SIXTEEN
    return _cond_sub_m(s, carry, m)


def _msub(a, b, m):
    """(a - b) mod m on limb-vector lists."""
    d = []
    borrow = None
    for k in range(16):
        v = a[k] - b[k] - (0 if borrow is None else borrow)
        d.append(v & MASK)
        borrow = (v >> 31) & 1
    underflow = borrow.astype(bool)
    out = []
    carry = None
    for k in range(16):
        v = d[k] + m[k] + (0 if carry is None else carry)
        out.append(v & MASK)
        carry = v >> SIXTEEN
    return [jnp.where(underflow, o, x) for o, x in zip(out, d)]


def _mdbl(a, m):
    return _madd(a, a, m)


def _mis_zero(a):
    acc = a[0]
    for k in range(1, 16):
        acc = acc | a[k]
    return acc == 0


def _msel(mask, a, b):
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


def _sq_kernel_body(a_ref, o_ref, mod_limbs, n0inv):
    a = [a_ref[i, :] for i in range(16)]
    m = [int(v) for v in mod_limbs]
    res = _msq(a, m, n0inv)
    for k in range(16):
        o_ref[k, :] = res[k]


@functools.partial(jax.jit, static_argnums=0)
def square_limb_major(spec, a_t):
    """Montgomery square on limb-major arrays [16, N] (N % BLK == 0)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = a_t.shape[1]
    kernel = functools.partial(
        _sq_kernel_body, mod_limbs=tuple(int(v) for v in spec.mod_limbs),
        n0inv=spec.n0inv,
    )
    bspec = pl.BlockSpec((16, BLK), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // BLK,),
        in_specs=[bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )(a_t)


@functools.partial(jax.jit, static_argnums=0)
def square(spec, a):
    """Montgomery square for [..., 16] arrays via the TPU kernel (136 limb
    products vs mul's 256)."""
    shape = a.shape
    a = a.reshape(-1, 16)
    n = a.shape[0]
    n_pad = -(-n // BLK) * BLK
    if n_pad != n:
        a = jnp.pad(a, ((0, n_pad - n), (0, 0)))
    out_t = square_limb_major(spec, a.T)
    return out_t.T[:n].reshape(shape)


def _mul_kernel_body(a_ref, b_ref, o_ref, mod_limbs, n0inv):
    a = [a_ref[i, :] for i in range(16)]
    b = [b_ref[i, :] for i in range(16)]
    m = [int(v) for v in mod_limbs]
    res = _mm(a, b, m, n0inv)
    for k in range(16):
        o_ref[k, :] = res[k]


@functools.partial(jax.jit, static_argnums=0)
def mul_limb_major(spec, a_t, b_t):
    """Montgomery modmul on limb-major arrays [16, N] (N % BLK == 0)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = a_t.shape[1]
    mod_limbs = tuple(int(v) for v in spec.mod_limbs)

    kernel = functools.partial(
        _mul_kernel_body, mod_limbs=mod_limbs, n0inv=spec.n0inv
    )
    grid = (n // BLK,)
    bspec = pl.BlockSpec((16, BLK), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec, bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )(a_t, b_t)


@functools.partial(jax.jit, static_argnums=0)
def mul(spec, a, b):
    """Drop-in Montgomery product for [..., 16] arrays via the TPU kernel.

    Pads the flattened batch to a BLK multiple; transposes at the boundary
    (fused by XLA into the kernel's gather/scatter).
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(-1, 16)
    b = jnp.broadcast_to(b, shape).reshape(-1, 16)
    n = a.shape[0]
    n_pad = -(-n // BLK) * BLK
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    out_t = mul_limb_major(spec, a.T, b.T)
    return out_t.T[:n].reshape(shape)
