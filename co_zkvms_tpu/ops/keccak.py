"""Keccak-f[1600] and Keccak-256, host (Python ints) and device (jnp u32).

The device variant operates on 64-bit lanes as (lo, hi) uint32 pairs so the
permutation is pure 32-bit bitwise VPU work and can run *inside* a jitted
prover — this is what lets Fiat-Shamir live on-device (see transcript.py)
instead of round-tripping to a coordinator like the reference
(co-spartan/src/coordinator.rs rep3_zk_sumcheck_coordinator does 1 network
RTT per sumcheck round; our transcript replaces that with ~1 keccak-f).

Keccak-256 uses the pre-NIST 0x01 padding (Ethereum/Jolt convention, matching
the behavior of jolt-core's KeccakTranscript dependency).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

RATE_BYTES = 136  # Keccak-256 rate (1088 bits)

_ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y] (x = column, y = row), lane index = x + 5*y
_ROTATION = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_MASK64 = (1 << 64) - 1


def _rotl64(v: int, r: int) -> int:
    r %= 64
    return ((v << r) | (v >> (64 - r))) & _MASK64


def keccak_f_host(lanes):
    """One Keccak-f[1600] permutation on a 25-list of 64-bit ints (x+5y order)."""
    a = list(lanes)
    for rc in _ROUND_CONSTANTS:
        # theta
        c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl64(c[(x + 1) % 5], 1) for x in range(5)]
        a = [a[i] ^ d[i % 5] for i in range(25)]
        # rho + pi
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl64(
                    a[x + 5 * y], _ROTATION[x][y]
                )
        # chi
        a = [
            b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y])
            for y in range(5)
            for x in range(5)
        ]
        # iota
        a[0] ^= rc
    return a


def keccak256_host(data: bytes) -> bytes:
    """Keccak-256 (0x01 padding) of arbitrary bytes, host-side."""
    padded = bytearray(data)
    padded.append(0x01)
    while len(padded) % RATE_BYTES:
        padded.append(0x00)
    padded[-1] |= 0x80
    state = [0] * 25
    for off in range(0, len(padded), RATE_BYTES):
        block = padded[off : off + RATE_BYTES]
        for i in range(RATE_BYTES // 8):
            state[i] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
        state = keccak_f_host(state)
    out = b"".join(state[i].to_bytes(8, "little") for i in range(4))
    return out


# --- device (jnp) version ---------------------------------------------------

_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _ROUND_CONSTANTS], dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _ROUND_CONSTANTS], dtype=np.uint32)


def _rotl_pair(lo, hi, r: int):
    """Rotate-left a 64-bit lane stored as (lo, hi) uint32s by static r."""
    r %= 64
    if r == 0:
        return lo, hi
    if r == 32:
        return hi, lo
    if r > 32:
        lo, hi = hi, lo
        r -= 32
    rr = jnp.uint32(r)
    inv = jnp.uint32(32 - r)
    new_lo = (lo << rr) | (hi >> inv)
    new_hi = (hi << rr) | (lo >> inv)
    return new_lo, new_hi


def keccak_f(state):
    """Keccak-f[1600] on jnp state [..., 25, 2] uint32 (last axis = lo, hi).

    One round traced, lax.scan over the 24 round constants — keeps the XLA
    graph small (unrolling 24 rounds of ~250 bitwise ops stalls the CPU
    compiler for minutes).
    """

    def round_fn(st, rc):
        rc_lo, rc_hi = rc
        lanes = [(st[..., i, 0], st[..., i, 1]) for i in range(25)]
        lanes = _round_body(lanes, rc_lo, rc_hi)
        los = jnp.stack([l for l, _ in lanes], axis=-1)
        his = jnp.stack([h for _, h in lanes], axis=-1)
        return jnp.stack([los, his], axis=-1), None

    rcs = (jnp.asarray(_RC_LO), jnp.asarray(_RC_HI))
    state, _ = jax.lax.scan(round_fn, state, rcs)
    return state


def _round_body(lanes, rc_lo, rc_hi):
    if True:
        # theta
        c = []
        for x in range(5):
            lo = lanes[x][0]
            hi = lanes[x][1]
            for y in range(1, 5):
                lo = lo ^ lanes[x + 5 * y][0]
                hi = hi ^ lanes[x + 5 * y][1]
            c.append((lo, hi))
        d = []
        for x in range(5):
            rl, rh = _rotl_pair(*c[(x + 1) % 5], 1)
            d.append((c[(x - 1) % 5][0] ^ rl, c[(x - 1) % 5][1] ^ rh))
        lanes = [
            (lanes[i][0] ^ d[i % 5][0], lanes[i][1] ^ d[i % 5][1]) for i in range(25)
        ]
        # rho + pi
        b = [None] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl_pair(
                    *lanes[x + 5 * y], _ROTATION[x][y]
                )
        # chi
        lanes = [
            (
                b[x + 5 * y][0] ^ (~b[(x + 1) % 5 + 5 * y][0] & b[(x + 2) % 5 + 5 * y][0]),
                b[x + 5 * y][1] ^ (~b[(x + 1) % 5 + 5 * y][1] & b[(x + 2) % 5 + 5 * y][1]),
            )
            for y in range(5)
            for x in range(5)
        ]
        # iota
        lanes[0] = (lanes[0][0] ^ rc_lo, lanes[0][1] ^ rc_hi)
    return lanes


@jax.jit
def keccak256_block(block_u32):
    """Keccak-256 of exactly one already-padded rate block.

    ``block_u32``: [..., 34] uint32 = 136 bytes little-endian. Returns
    [..., 8] uint32 = 32-byte digest.
    """
    shape = block_u32.shape[:-1]
    state = jnp.zeros(shape + (25, 2), dtype=jnp.uint32)
    lanes = block_u32.reshape(shape + (17, 2))
    state = state.at[..., :17, :].set(lanes)
    state = keccak_f(state)
    return state[..., :4, :].reshape(shape + (8,))
