"""Rep3 binary (XOR) shares and ring (Z_2^32) shares with a2b/b2a.

Maps mpc-types' ``Rep3BigUintShare``/``Rep3Ring`` and co-snarks'
``a2b``/``b2a`` conversions (SURVEY.md §2.1, §2.2 "conversions & LUT" —
consumed by co-jolt's MPC witness generation,
instruction_lookups/witness.rs:52-210).

TPU-first encoding: a binary share of a 32-bit value is ONE uint32 lane (all
32 bit positions processed simultaneously by the VPU's bitwise ops); a ring
share is a uint32 with native wraparound. Share stacks carry the party axis
first, exactly like parallel/shares.py:

- XOR/NOT/shift: local.
- AND: Rep3 degree-2 local product (a&b ^ a&b' ^ a'&b) + zero re-share.
- a2b: trivial replicated binary sharings of the three additive summands,
  then two Kogge-Stone adders (log2(32)=5 shared-AND rounds each) — the
  bit-parallel version of the reference's ripple circuits.
- b2a (to Fr): per-bit symmetric-polynomial recomposition
  b = b0+b1+b2 - 2(b0b1+b0b2+b1b2) + 4*b0b1b2 with two batched Fr muls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops.field import FR
from . import mpc, shares as S

U32 = jnp.uint32
W = 32


# --- ring shares (additive mod 2^32) ---------------------------------------


def ring_share(key, x_u32):
    """Additive Rep3 shares of uint32 values: [3, ...] u32 (wraparound)."""
    k0, k1 = jax.random.split(key)
    r0 = jax.random.bits(k0, x_u32.shape, dtype=U32)
    r1 = jax.random.bits(k1, x_u32.shape, dtype=U32)
    r2 = x_u32 - r0 - r1
    return jnp.stack([r0, r1, r2])


def ring_combine(shares):
    return shares[0] + shares[1] + shares[2]


# --- binary shares ----------------------------------------------------------


def bin_share(key, x_u32):
    """XOR Rep3 shares: [3, ...] u32; party p holds (s_p, s_{p-1})."""
    k0, k1 = jax.random.split(key)
    r0 = jax.random.bits(k0, x_u32.shape, dtype=U32)
    r1 = jax.random.bits(k1, x_u32.shape, dtype=U32)
    r2 = x_u32 ^ r0 ^ r1
    return jnp.stack([r0, r1, r2])


def bin_combine(shares):
    return shares[0] ^ shares[1] ^ shares[2]


def bin_xor(x, y):
    return x ^ y


def bin_xor_public(x, c):
    """XOR with a public constant: only party 0 applies it."""
    return x.at[0].set(x[0] ^ c)


def bin_not(x):
    return bin_xor_public(x, jnp.uint32(0xFFFFFFFF))


def bin_zero_shares(key, shape):
    """Correlated zero XOR shares (s_p ^ s_{p-1} pattern)."""
    keys = jax.random.split(key, 3)
    r = jnp.stack([jax.random.bits(k, shape, dtype=U32) for k in keys])
    return r ^ jnp.roll(r, 1, axis=0)


def bin_and(x, y, zero=None):
    """Shared AND: local 3-term product + re-randomization."""
    xb = jnp.roll(x, 1, axis=0)
    yb = jnp.roll(y, 1, axis=0)
    d = (x & y) ^ (x & yb) ^ (xb & y)
    if zero is not None:
        d = d ^ zero
    from . import comm
    comm.record_binary_and(d.shape[1:])
    return d


def bin_shl(x, k: int):
    return x << jnp.uint32(k)


def ring_mul(x, y, zero=None):
    """Rep3 multiply of additive Z_2^32 ring shares: local 3-term cross
    product (wraparound is the ring reduction) + optional zero re-share —
    the ring analog of mpc.mul (rep3_ring arithmetic, SURVEY §2.1)."""
    xb = jnp.roll(x, 1, axis=0)
    yb = jnp.roll(y, 1, axis=0)
    d = x * y + x * yb + xb * y
    if zero is not None:
        d = d + zero
    from . import comm
    comm.record_binary_and(d.shape[1:])
    return d


def ring_zero_shares(key, shape):
    """Correlated additive-zero ring shares (r_p - r_{p-1})."""
    keys = jax.random.split(key, 3)
    r = jnp.stack([jax.random.bits(k, shape, dtype=U32) for k in keys])
    return r - jnp.roll(r, 1, axis=0)


def ring_add_public(x, c):
    """Add a public u32 constant: party 0 only."""
    return x.at[0].set(x[0] + jnp.uint32(c))


# --- a2b: additive (mod 2^32) -> binary -------------------------------------


def _trivial_bin(known_value, holder: int):
    """Replicated XOR sharing (s_0,s_1,s_2) with s_holder = value, rest 0.

    ``known_value`` is party ``holder``'s additive share — in Rep3 it is held
    by parties holder and holder+1, so this sharing needs no communication.
    """
    zeros = jnp.zeros_like(known_value)
    parts = [zeros, zeros, zeros]
    parts[holder] = known_value
    return jnp.stack(parts)


def _ks_add(x, y, key):
    """Kogge-Stone addition of two binary-shared u32 vectors (5 AND rounds)."""
    zero_keys = jax.random.split(key, 6)
    p = bin_xor(x, y)
    g = bin_and(x, y, bin_zero_shares(zero_keys[0], x.shape[1:]))
    shift = 1
    for i in range(5):
        p_sh = bin_shl(p, shift)
        g_sh = bin_shl(g, shift)
        g = bin_xor(g, bin_and(p, g_sh,
                               bin_zero_shares(zero_keys[i + 1], x.shape[1:])))
        p = bin_and(p, p_sh)  # p-chain needs no fresh mask (already uniform)
        shift *= 2
    return bin_xor(bin_xor(x, y), bin_shl(g, 1))


def a2b(ring_shares, key):
    """Additive Z_2^32 shares [3, ...] -> binary XOR shares [3, ...]."""
    x0 = _trivial_bin(ring_shares[0], 0)
    x1 = _trivial_bin(ring_shares[1], 1)
    x2 = _trivial_bin(ring_shares[2], 2)
    k1, k2 = jax.random.split(key)
    s = _ks_add(x0, x1, k1)
    return _ks_add(s, x2, k2)


# --- 64-bit (2-lane) variants: the production WORD=32 geometry --------------
#
# A Z_2^64 element is a little-endian (lo, hi) u32 lane pair on a trailing
# axis of size 2 (parallel/ring.py U64R); binary XOR shares keep the same
# layout — all bitwise ops are elementwise over the lane axis, only SHIFTS
# cross lanes. This is the 2-limb adder that lifts sum/diff/prod index
# decomposition to architectural 32-bit operands (witness.rs:52-210's a2b at
# the reference's native width).


def _shl2(x2, s: int):
    """Logical left shift of 2-lane (lo, hi) pairs by a static amount."""
    lo, hi = x2[..., 0], x2[..., 1]
    if s == 0:
        return x2
    if s >= 64:
        return jnp.zeros_like(x2)
    if s >= 32:
        nlo = jnp.zeros_like(lo)
        nhi = lo << U32(s - 32) if s > 32 else lo
        return jnp.stack([nlo, nhi], axis=-1)
    return jnp.stack([lo << U32(s),
                      (hi << U32(s)) | (lo >> U32(32 - s))], axis=-1)


def _ks_add2(x, y, key):
    """Kogge-Stone addition of two binary-shared u64 (2-lane) vectors
    (6 AND rounds)."""
    zero_keys = jax.random.split(key, 7)
    p = bin_xor(x, y)
    g = bin_and(x, y, bin_zero_shares(zero_keys[0], x.shape[1:]))
    shift = 1
    for i in range(6):
        p_sh = _shl2(p, shift)
        g_sh = _shl2(g, shift)
        g = bin_xor(g, bin_and(p, g_sh,
                               bin_zero_shares(zero_keys[i + 1],
                                               x.shape[1:])))
        p = bin_and(p, p_sh)  # p-chain needs no fresh mask (already uniform)
        shift *= 2
    return bin_xor(bin_xor(x, y), _shl2(g, 1))


def a2b64(ring2_shares, key):
    """Additive Z_2^64 shares [3, ..., 2] -> binary XOR shares [3, ..., 2]."""
    x0 = _trivial_bin(ring2_shares[0], 0)
    x1 = _trivial_bin(ring2_shares[1], 1)
    x2 = _trivial_bin(ring2_shares[2], 2)
    k1, k2 = jax.random.split(key)
    s = _ks_add2(x0, x1, k1)
    return _ks_add2(s, x2, k2)


# --- b2a: binary -> Fr arithmetic shares ------------------------------------


def b2a_fr(bin_shares, key):
    """Binary u32 shares [3, ...] -> Fr share stack [3, ..., 16] of the value.

    Per bit: b = s0 ^ s1 ^ s2 lifted to Fr via the symmetric polynomial
    s0+s1+s2 - 2*e2 + 4*e3 (e2, e3 = elementary symmetric) computed with the
    Rep3 field multiplication (two batched muls).
    """
    b_arith = b2a_bits_fr(bin_shares, nbits=W)
    # sum_bit 2^bit * b_bit
    acc = None
    for bit in range(W):
        term = F.mul_small(FR, b_arith[bit], 1 << bit)
        acc = term if acc is None else F.add(FR, acc, term)
    return acc


def b2a_bits_fr(bin_shares, nbits: int = W):
    """Binary u32 shares [3, ...] -> per-bit Fr share stacks
    [nbits, 3, ..., 16] (each entry an arithmetic sharing of bit j of the
    value). The bit-level output is what MPC witness generation consumes to
    assemble lookup dims and one-hot vectors share-side
    (instruction_lookups/witness.rs:52-210's a2b chunking).
    """
    shape = bin_shares.shape[1:]
    # bits as field elements, trivially shared per owner party
    bit_stacks = []
    for bit in range(nbits):
        bits = (bin_shares >> jnp.uint32(bit)) & jnp.uint32(1)
        # party p's share s_p known to p and p+1: promote s_p into an Fr
        # trivial share held at slot p
        fr_bits = []
        for p in range(3):
            flat = bits[p].reshape(-1)
            fe = F._select(
                flat.astype(bool),
                F.ones_mont(FR, flat.shape),
                F.zeros(flat.shape),
            ).reshape(shape + (F.NLIMBS,))
            fr_bits.append(fe)
        bit_stacks.append(fr_bits)

    # stack over bits: [W, 3, ..., 16] with share slot p = s_p
    u = jnp.stack([jnp.stack([bs[0], jnp.zeros_like(bs[0]),
                              jnp.zeros_like(bs[0])]) for bs in bit_stacks])
    v = jnp.stack([jnp.stack([jnp.zeros_like(bs[1]), bs[1],
                              jnp.zeros_like(bs[1])]) for bs in bit_stacks])
    w = jnp.stack([jnp.stack([jnp.zeros_like(bs[2]), jnp.zeros_like(bs[2]),
                              bs[2]]) for bs in bit_stacks])

    def vmul(a, b):
        return jax.vmap(lambda x, y: mpc.mul(FR, x, y))(a, b)

    s1 = F.add(FR, F.add(FR, u, v), w)
    uv = vmul(u, v)
    uw = vmul(u, w)
    vw = vmul(v, w)
    e2 = F.add(FR, F.add(FR, uv, uw), vw)
    e3 = vmul(uv, w)
    b_arith = F.sub(FR, s1, F.add(FR, e2, e2))
    four_e3 = F.add(FR, F.add(FR, e3, e3), F.add(FR, e3, e3))
    b_arith = F.add(FR, b_arith, four_e3)  # [nbits, 3, ..., 16]
    return b_arith


def b2a_bits_fr2(bin2_shares, nbits: int):
    """2-lane (lo, hi) binary shares [3, ..., 2] -> per-bit Fr share stacks
    [nbits, 3, ..., 16] (nbits <= 64): per-lane b2a_bits_fr, concatenated."""
    lo_bits = b2a_bits_fr(bin2_shares[..., 0], min(nbits, W))
    if nbits <= W:
        return lo_bits
    hi_bits = b2a_bits_fr(bin2_shares[..., 1], nbits - W)
    return jnp.concatenate([lo_bits, hi_bits], axis=0)
