"""Keccak-based Fiat-Shamir transcript: on-device state + exact host mirror.

Scheme (fixed-size chained sponge, one keccak-f per operation):

    S_0 = keccak256(label)
    absorb(v):    S <- keccak256(S || bytes32_le(v) || 0x00)      (65-byte msg)
    challenge():  y = keccak256(S || zeros32 || 0x02);  S <- y
                  c = int_le(y) mod r      (wide Montgomery reduction)

Each message is exactly 65 bytes < rate, so every operation is a single
keccak-f[1600] on a statically-laid-out 136-byte block — trivially jittable.
The device transcript state is a bare ``[..., 8] uint32`` array threaded
through the prover; ``HostTranscript`` reproduces the byte stream exactly for
the (host-side) verifier.

Role parity with the reference: snarks-core's ``Transcript`` trait /
``TranscriptMerlin`` (transcript.rs:11-169) and co-jolt's ``KeccakTranscript``
+ ``TranscriptExt::state/from_state`` (utils/transcript.rs:4-33). Where the
reference syncs transcript state over the network between coordinator and
workers, here every mesh shard computes the identical state locally from
public/combined values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import field as F
from . import keccak as K
from .field import FR

ABSORB_TAG = 0x00
CHALLENGE_TAG = 0x02


# --- device ----------------------------------------------------------------


def init(label: bytes):
    """New transcript state from a static label (host-computed constant)."""
    digest = K.keccak256_host(label)
    words = [int.from_bytes(digest[4 * i : 4 * i + 4], "little") for i in range(8)]
    return jnp.array(words, dtype=jnp.uint32)


def _limbs_to_u32x8(std_limbs):
    """16x16-bit standard-form limbs -> 8 packed uint32 words (LE)."""
    lo = std_limbs[..., 0::2]
    hi = std_limbs[..., 1::2]
    return lo | (hi << jnp.uint32(16))


def _u32x8_to_limbs(words):
    """8 uint32 words -> 16x16-bit limb array."""
    lo = words & jnp.uint32(0xFFFF)
    hi = words >> jnp.uint32(16)
    return jnp.stack([lo, hi], axis=-1).reshape(words.shape[:-1] + (16,))


def _block(state, payload_u32x8, tag: int):
    """Assemble the padded 136-byte rate block for one transcript op."""
    shape = state.shape[:-1]
    tagword = jnp.full(shape + (1,), tag | (0x01 << 8), dtype=jnp.uint32)
    zeros = jnp.zeros(shape + (16,), dtype=jnp.uint32)
    endpad = jnp.full(shape + (1,), 0x80 << 24, dtype=jnp.uint32)
    return jnp.concatenate([state, payload_u32x8, tagword, zeros, endpad], axis=-1)


@jax.jit
def absorb_words(state, words_u32x8):
    """Absorb one 32-byte payload already packed as 8 uint32 words."""
    return K.keccak256_block(_block(state, words_u32x8, ABSORB_TAG))


@functools.partial(jax.jit, static_argnums=0)
def absorb_fe(spec, state, fe_mont):
    """Absorb one field element (Montgomery in; absorbed as standard bytes)."""
    std = F.from_mont(spec, fe_mont)
    return absorb_words(state, _limbs_to_u32x8(std))


@functools.partial(jax.jit, static_argnums=0)
def absorb_fes(spec, state, fes_mont):
    """Absorb a vector of field elements [n, 16] in order (lax.scan chain)."""
    std = F.from_mont(spec, fes_mont)
    words = _limbs_to_u32x8(std)

    def step(s, w):
        return absorb_words(s, w), None

    state, _ = jax.lax.scan(step, state, words)
    return state


@jax.jit
def challenge_fe(state):
    """Squeeze one Fr challenge (Montgomery form). Returns (state', c)."""
    payload = jnp.zeros(state.shape[:-1] + (8,), dtype=jnp.uint32)
    y = K.keccak256_block(_block(state, payload, CHALLENGE_TAG))
    y_limbs = _u32x8_to_limbs(y)
    # Montgomery form of (y mod r): mont_mul(y, R^2) is valid for any y < R.
    c = F.mul(FR, y_limbs, jnp.asarray(FR.r2_limbs))
    return y, c


@functools.partial(jax.jit, static_argnums=1)
def challenge_fes(state, n: int):
    """Squeeze n Fr challenges. Returns (state', [n, 16])."""

    def step(s, _):
        s, c = challenge_fe(s)
        return s, c

    state, cs = jax.lax.scan(step, state, None, length=n)
    return state, cs


# --- host mirror ------------------------------------------------------------


class HostTranscript:
    """Byte-exact host mirror of the device transcript (verifier side)."""

    def __init__(self, label: bytes):
        self.state = K.keccak256_host(label)

    @classmethod
    def from_device_state(cls, state_u32x8):
        t = cls.__new__(cls)
        words = [int(w) for w in jax.device_get(state_u32x8)]
        t.state = b"".join(w.to_bytes(4, "little") for w in words)
        return t

    def device_state(self):
        words = [
            int.from_bytes(self.state[4 * i : 4 * i + 4], "little") for i in range(8)
        ]
        return jnp.array(words, dtype=jnp.uint32)

    def absorb(self, value: int):
        """Absorb a standard-form value (< 2^256) as 32 LE bytes."""
        msg = self.state + int(value).to_bytes(32, "little") + bytes([ABSORB_TAG])
        self.state = K.keccak256_host(msg)

    def absorb_many(self, values):
        for v in values:
            self.absorb(v)

    def absorb_point(self, xy):
        """Absorb an affine G1 point (x, y ints; (0,0) = infinity)."""
        self.absorb(xy[0])
        self.absorb(xy[1])

    def challenge(self) -> int:
        msg = self.state + bytes(32) + bytes([CHALLENGE_TAG])
        y = K.keccak256_host(msg)
        self.state = y
        return int.from_bytes(y, "little") % FR.modulus

    def challenges(self, n: int):
        return [self.challenge() for _ in range(n)]
