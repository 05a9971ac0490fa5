"""Rep3 shares over generic rings Z_{2^k} (k = 1..64) incl. the Bit type.

Maps mpc-types' ``rep3_ring`` (ring_impl.rs, int_ring.rs, bit.rs — ~1.5k
LoC of per-width Rust types): replicated additive sharing over power-of-two
rings, the building block for binary-domain gadgets (range decompositions,
counters, the Bit share type used by conversions).

TPU-first encoding: one ring element is one u32 lane (k <= 32) or a (lo,
hi) u32 lane pair (k <= 64); arithmetic is native wraparound masked to k
bits, so every operation is a full-width VPU op across the batch. The
party axis is the leading axis of the share stack exactly as in
parallel/shares.py ([3, ...] u32, party p holding (s_p, s_{p-1}) with the
b-component materialized by roll). k=1 is the Bit type: mod-2 addition IS
xor and multiplication IS and (bit.rs parity) — no special case needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

U32 = jnp.uint32


class RingSpec(NamedTuple):
    """Z_{2^k}. ``lanes`` = 1 (k<=32) or 2 (k<=64, little-endian lane pair,
    carried along a trailing axis of size 2)."""

    k: int

    @property
    def lanes(self) -> int:
        return 1 if self.k <= 32 else 2

    @property
    def lo_mask(self):
        bits = min(self.k, 32)
        return U32(0xFFFFFFFF if bits == 32 else (1 << bits) - 1)

    @property
    def hi_mask(self):
        bits = self.k - 32
        return U32(0xFFFFFFFF if bits == 32 else (1 << bits) - 1)


BIT = RingSpec(1)
U8R = RingSpec(8)
U16R = RingSpec(16)
U32R = RingSpec(32)
U64R = RingSpec(64)


def _mask(spec: RingSpec, x):
    if spec.lanes == 1:
        return x & spec.lo_mask
    return jnp.stack([x[..., 0] & spec.lo_mask, x[..., 1] & spec.hi_mask],
                     axis=-1)


def from_ints(spec: RingSpec, vals) -> jax.Array:
    """Host ints -> ring element array ([...] u32 or [..., 2] u32)."""
    import numpy as np

    a = np.asarray(vals, dtype=np.uint64) & ((1 << spec.k) - 1)
    if spec.lanes == 1:
        return jnp.asarray(a.astype(np.uint32))
    return jnp.stack(
        [jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32)),
         jnp.asarray((a >> 32).astype(np.uint32))], axis=-1)


def to_ints(spec: RingSpec, x):
    import numpy as np

    a = np.asarray(jax.device_get(x))
    if spec.lanes == 1:
        return a.astype(np.uint64)
    return a[..., 0].astype(np.uint64) | (a[..., 1].astype(np.uint64) << 32)


# --- local ring arithmetic on raw elements ----------------------------------


def add(spec: RingSpec, x, y):
    if spec.lanes == 1:
        return _mask(spec, x + y)
    lo = x[..., 0] + y[..., 0]
    carry = (lo < x[..., 0]).astype(U32)
    return _mask(spec, jnp.stack([lo, x[..., 1] + y[..., 1] + carry], -1))


def neg(spec: RingSpec, x):
    if spec.lanes == 1:
        return _mask(spec, jnp.uint32(0) - x)
    lo = jnp.uint32(0) - x[..., 0]
    borrow = (x[..., 0] != 0).astype(U32)
    return _mask(spec, jnp.stack([lo, jnp.uint32(0) - x[..., 1] - borrow], -1))


def sub(spec: RingSpec, x, y):
    return add(spec, x, neg(spec, y))


def mul_elems(spec: RingSpec, x, y):
    """Elementwise ring product of raw (non-share) elements."""
    if spec.lanes == 1:
        return _mask(spec, x * y)
    # 64-bit product from 32x32 partials (low 64 bits only)
    x0, x1 = x[..., 0], x[..., 1]
    y0, y1 = y[..., 0], y[..., 1]
    # u32*u32 -> need the high half: split into 16-bit digits
    def mul64(a, b):
        a0, a1 = a & 0xFFFF, a >> 16
        b0, b1 = b & 0xFFFF, b >> 16
        ll = a0 * b0
        # u32 products of 16-bit halves are exact; their sum may wrap once
        hi_lo = a1 * b0
        mid_lo = hi_lo + a0 * b1
        mid_carry = (mid_lo < hi_lo).astype(U32)
        lo = ll + ((mid_lo & 0xFFFF) << 16)
        c1 = (lo < ll).astype(U32)
        hi = a1 * b1 + (mid_lo >> 16) + (mid_carry << 16) + c1
        return lo, hi

    lo, hi = mul64(x0, y0)
    hi = hi + x0 * y1 + x1 * y0
    return _mask(spec, jnp.stack([lo, hi], -1))


def shl(spec: RingSpec, x, s: int):
    if spec.lanes == 1:
        return _mask(spec, x << U32(s)) if s < 32 else jnp.zeros_like(x)
    if s == 0:
        return x
    if s >= 64:
        return jnp.zeros_like(x)
    lo, hi = x[..., 0], x[..., 1]
    if s >= 32:
        return _mask(spec, jnp.stack([jnp.zeros_like(lo),
                                      lo << U32(s - 32)], -1))
    return _mask(spec, jnp.stack(
        [lo << U32(s), (hi << U32(s)) | (lo >> U32(32 - s))], -1))


# --- Rep3 sharing ------------------------------------------------------------


def share(spec: RingSpec, key, x):
    """Additive Rep3 shares: [3, ...] stack summing to x mod 2^k."""
    k0, k1 = jax.random.split(key)
    shape = x.shape
    r0 = _mask(spec, jax.random.bits(k0, shape, dtype=U32).reshape(shape))
    r1 = _mask(spec, jax.random.bits(k1, shape, dtype=U32).reshape(shape))
    r2 = sub(spec, sub(spec, x, r0), r1)
    return jnp.stack([r0, r1, r2])


def combine(spec: RingSpec, shares):
    return add(spec, add(spec, shares[0], shares[1]), shares[2])


def b_component(shares):
    """Party p's second held share s_{p-1} (replicated pair bookkeeping)."""
    return jnp.roll(shares, 1, axis=0)


def add_shares(spec: RingSpec, x, y):
    return add(spec, x, y)


def add_public(spec: RingSpec, x, c):
    """Only party 0 applies the public constant (additive convention)."""
    x0 = add(spec, x[0], jnp.broadcast_to(c, x[0].shape))
    return jnp.concatenate([x0[None], x[1:]], axis=0)


def mul_public(spec: RingSpec, x, c):
    return jax.vmap(lambda s: mul_elems(spec, s, jnp.broadcast_to(c, s.shape))
                    )(x)


def zero_shares(spec: RingSpec, key, shape):
    """Correlated zero: r_p - r_{p-1} summing to 0 mod 2^k."""
    if spec.lanes == 2:
        shape = tuple(shape) + (2,)
    r = jax.vmap(lambda k: _mask(spec, jax.random.bits(k, shape, dtype=U32)))(
        jax.random.split(key, 3))
    return sub(spec, r, jnp.roll(r, 1, axis=0))


def mul_shares(spec: RingSpec, x, y, zero=None):
    """Share-by-share ring product -> additive shares (degree-2 local +
    implicit reshare; ring analog of mpc.mul). For BIT this is shared AND."""
    xb = b_component(x)
    yb = b_component(y)
    d = add(spec, add(spec, mul_elems(spec, x, y), mul_elems(spec, x, yb)),
            mul_elems(spec, xb, y))
    if zero is not None:
        d = add(spec, d, zero)
    return d


# --- Bit type (bit.rs parity: Z_2 — xor is add, and is mul) ------------------


def bit_xor(x, y):
    return add(BIT, x, y)


def bit_and(x, y, zero=None):
    return mul_shares(BIT, x, y, zero)


def bit_not(x):
    return add_public(BIT, x, jnp.uint32(1))


# --- casts -------------------------------------------------------------------


def cast(src: RingSpec, dst: RingSpec, x):
    """Share-preserving cast. Truncation (dst.k <= src.k) is exact on
    additive shares (mod 2^dst.k is a ring hom). Widening is NOT share-exact
    (carries above 2^src.k leak into the widened range) — the reference
    upcasts via bit-decomposition; here widening requires src == dst width
    class and is rejected otherwise."""
    if dst.k > src.k:
        raise ValueError("ring widening requires bit-decomposition (a2b)")
    if src.lanes == 2 and dst.lanes == 1:
        x = x[..., 0]
    return jax.vmap(lambda s: _mask(dst, s))(x)
