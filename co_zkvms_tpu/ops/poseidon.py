"""Poseidon permutation over BN254 Fr: vectorized device kernel + host mirror.

BASELINE's north star names Poseidon among the transcript/commitment
primitives to provide as vectorized kernels (the reference stack itself
Fiat-Shamirs with Keccak/Merlin — snarks-core/src/transcript.rs — but Noir
circuits and Merkle-tree PCS pipelines built on this framework hash with
Poseidon; capability parity target: a batched x^5 Poseidon suitable for
Merkle layers and an Fr-native transcript).

Instance (documented, self-consistent — see README "Conformance strategy"):

- x^5 S-box, width t in {3, 4, 5}; R_F = 8 full rounds and the per-width
  partial-round counts from the Poseidon paper's 128-bit BN254 table;
- round constants from the paper's Grain LFSR procedure (80-bit state,
  160 discarded warm-up bits, shrinking decimation, rejection sampling to
  < r), seeded with the (field, sbox, n, t, R_F, R_P) header;
- MDS: Cauchy matrix 1/(x_i + y_j) over further Grain samples (resampled
  if any pair collides), checked invertible.

The device kernel is a straight-line jnp program over the limb-vector
layout: a batch of states is [..., t, 16] u32 Montgomery; each round is a
handful of batched field muls (3 per S-box, t*t for the MDS apply) that
dispatch to the fused Pallas field kernels on TPU. One permutation of a
2^20-state batch is ~830 batched modmuls — flat field-mul rate.

``host_permute``/``host_hash`` mirror the kernel exactly on Python ints (the
verifier side); bit-equality is tested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import field as F
from .field import FR

R_FULL = 8
# partial rounds for x^5, 254-bit field, 128-bit security (Poseidon paper
# table 2 / reference script output for t = 3, 4, 5)
R_PARTIAL = {3: 57, 4: 56, 5: 60}


# --- Grain LFSR parameter generation (host, cached) --------------------------


class _Grain:
    """80-bit Grain LFSR from the Poseidon reference parameter script."""

    def __init__(self, n_bits: int, t: int, r_f: int, r_p: int):
        bits = []

        def put(val, width):
            bits.extend((val >> (width - 1 - i)) & 1 for i in range(width))

        put(1, 2)        # field tag: GF(p)
        put(0, 4)        # sbox tag: x^alpha
        put(n_bits, 12)
        put(t, 12)
        put(r_f, 10)
        put(r_p, 10)
        bits.extend([1] * 30)
        assert len(bits) == 80
        self.state = bits
        self.n_bits = n_bits
        for _ in range(160):
            self._next()

    def _next(self) -> int:
        s = self.state
        b = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        s.pop(0)
        s.append(b)
        return b

    def _next_filtered(self) -> int:
        while True:
            b1 = self._next()
            b2 = self._next()
            if b1:
                return b2

    def field_element(self, modulus: int) -> int:
        while True:
            v = 0
            for _ in range(self.n_bits):
                v = (v << 1) | self._next_filtered()
            if v < modulus:
                return v


@functools.lru_cache(maxsize=None)
def params_host(t: int):
    """(round_constants [(R_F+R_P) rounds][t], mds [t][t]) as host ints."""
    r_p = R_PARTIAL[t]
    r = FR.modulus
    g = _Grain(254, t, R_FULL, r_p)
    rc = [[g.field_element(r) for _ in range(t)]
          for _ in range(R_FULL + r_p)]
    while True:
        xs = [g.field_element(r) for _ in range(t)]
        ys = [g.field_element(r) for _ in range(t)]
        if len({(x + y) % r for x in xs for y in ys}) == t * t and all(
            (x + y) % r != 0 for x in xs for y in ys
        ):
            break
    mds = [[pow((x + y) % r, r - 2, r) for y in ys] for x in xs]
    # Cauchy over distinct nonzero sums => nonsingular; assert anyway
    assert _det(mds, r) != 0
    return rc, mds


def _det(m, r):
    m = [row[:] for row in m]
    n = len(m)
    det = 1
    for c in range(n):
        piv = next((i for i in range(c, n) if m[i][c] % r), None)
        if piv is None:
            return 0
        if piv != c:
            m[c], m[piv] = m[piv], m[c]
            det = -det
        det = det * m[c][c] % r
        inv = pow(m[c][c], r - 2, r)
        for i in range(c + 1, n):
            f = m[i][c] * inv % r
            for j in range(c, n):
                m[i][j] = (m[i][j] - f * m[c][j]) % r
    return det % r


@functools.lru_cache(maxsize=None)
def _params_dev(t: int):
    """Device Montgomery tables: rc [(R_F+R_P)*t, 16], mds [t*t, 16].

    Always built eagerly (outside jit) so the cache never holds tracers.
    """
    rc, mds = params_host(t)
    rc_flat = [v for row in rc for v in row]
    mds_flat = [v for row in mds for v in row]
    return F.from_int(FR, rc_flat), F.from_int(FR, mds_flat)


# --- device kernel ------------------------------------------------------------


def _sbox5(x):
    x2 = F.mul(FR, x, x)
    x4 = F.mul(FR, x2, x2)
    return F.mul(FR, x4, x)


def _mds_apply(state, mds, t: int):
    # state [..., t, 16]; mds [t*t, 16] row-major
    m = mds.reshape(t, t, 16)
    out = F.mul(FR, m, state[..., None, :, :])       # [..., t, t, 16]
    return F.modsum(FR, jnp.moveaxis(out, -2, 0), axis=0)


def _poseidon_kernel(s0_ref, s1_ref, s2_ref, rc_ref, mds_ref,
                     o0_ref, o1_ref, o2_ref, mod, n0, r_p):
    """Full t=3 Poseidon permutation for one lane block, VMEM-resident.

    The jnp composition pays a limb-layout transpose around EVERY batched
    field mul (the elementwise adds between muls defeat XLA's
    transpose-cancellation) — measured 3.9 s for a 2^18-state batch. Here
    the whole 65-round permutation runs on registers: per round, constants
    are scalar-read from SMEM (dynamic round index), S-box and the 3x3 MDS
    apply are straight _mm/_msq/_madd limb ops, and state never leaves
    VMEM. Identical operation order to _permute_jit (bit-exact, tested).
    """
    from .field_pallas import _madd, _mm, _msq

    m = list(mod)

    def const_vec(row, like):
        return [jnp.full_like(like, rc_ref[row, l]) for l in range(16)]

    def mds_vec(i, j, like):
        return [jnp.full_like(like, mds_ref[3 * i + j, l]) for l in range(16)]

    def sbox(x):
        x2 = _msq(x, m, n0)
        x4 = _msq(x2, m, n0)
        return _mm(x4, x, m, n0)

    def addc(x, rnd, i):
        return _madd(x, const_vec(rnd * 3 + i, x[0]), m)

    def mds_apply(s):
        out = []
        for i in range(3):
            acc = None
            for j in range(3):
                p = _mm(mds_vec(i, j, s[j][0]), s[j], m, n0)
                acc = p if acc is None else _madd(acc, p, m)
            out.append(acc)
        return out

    def full_round(rnd, st):
        s = [sbox(addc(list(x), rnd, i)) for i, x in enumerate(st)]
        return tuple(tuple(v) for v in mds_apply(s))

    def partial_round(rnd, st):
        s = [addc(list(x), rnd, i) for i, x in enumerate(st)]
        s[0] = sbox(s[0])
        return tuple(tuple(v) for v in mds_apply(s))

    half = R_FULL // 2
    st = tuple(tuple(ref[i, :] for i in range(16))
               for ref in (s0_ref, s1_ref, s2_ref))
    st = jax.lax.fori_loop(0, half, full_round, st)
    st = jax.lax.fori_loop(half, half + r_p, partial_round, st)
    st = jax.lax.fori_loop(half + r_p, 2 * half + r_p, full_round, st)
    for ref, limbs in zip((o0_ref, o1_ref, o2_ref), st):
        for i in range(16):
            ref[i, :] = limbs[i]


@functools.partial(jax.jit, static_argnums=(1,))
def _permute_pallas_t3(state, r_p: int, rc, mds):
    """[N, 3, 16] Montgomery states through the fused kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from . import field_pallas as FP

    n = state.shape[0]
    blk = FP.BLK
    n_pad = max(-(-n // blk) * blk, blk)
    cols = []
    for i in range(3):
        c = state[:, i, :]
        if n_pad != n:
            c = jnp.pad(c, ((0, n_pad - n), (0, 0)))
        cols.append(c.T)                      # [16, n_pad]
    kernel = functools.partial(
        _poseidon_kernel, mod=tuple(int(v) for v in FR.mod_limbs),
        n0=FR.n0inv, r_p=r_p)
    bspec = pl.BlockSpec((16, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    o0, o1, o2 = pl.pallas_call(
        kernel,
        grid=(n_pad // blk,),
        in_specs=[bspec, bspec, bspec, sspec, sspec],
        out_specs=(bspec, bspec, bspec),
        out_shape=tuple(jax.ShapeDtypeStruct((16, n_pad), jnp.uint32)
                        for _ in range(3)),
        interpret=jax.default_backend() != "tpu",
    )(cols[0], cols[1], cols[2], rc, mds)
    return jnp.stack([o0.T[:n], o1.T[:n], o2.T[:n]], axis=1)


@functools.partial(jax.jit, static_argnums=(1,))
def _permute_jit(state, t: int, rc, mds):
    half = R_FULL // 2
    r_p = R_PARTIAL[t]
    rcr = rc.reshape(R_FULL + r_p, t, 16)
    rnd = 0
    for _ in range(half):
        state = _sbox5(F.add(FR, state, rcr[rnd]))
        state = _mds_apply(state, mds, t)
        rnd += 1
    for _ in range(r_p):
        state = F.add(FR, state, rcr[rnd])
        head = _sbox5(state[..., :1, :])
        state = jnp.concatenate([head, state[..., 1:, :]], axis=-2)
        state = _mds_apply(state, mds, t)
        rnd += 1
    for _ in range(half):
        state = _sbox5(F.add(FR, state, rcr[rnd]))
        state = _mds_apply(state, mds, t)
        rnd += 1
    return state


def permute(state):
    """Poseidon permutation on a [..., t, 16] Montgomery state batch.

    Large t=3 batches take the fused Pallas kernel (the whole permutation
    in VMEM — see _poseidon_kernel); small batches and other widths use
    the jnp composition. Bit-identical (tested)."""
    t = state.shape[-2]
    rc, mds = _params_dev(t)
    batch = 1
    for d in state.shape[:-2]:
        batch *= d
    if t == 3 and batch >= 1024 and jax.default_backend() == "tpu":
        flat = state.reshape(batch, 3, 16)
        out = _permute_pallas_t3(flat, R_PARTIAL[3], rc, mds)
        return out.reshape(state.shape)
    return _permute_jit(state, t, rc, mds)


def hash_fes(inputs):
    """Fixed-arity Poseidon hash: [..., k, 16] -> [..., 16] (k = t-1 rate).

    Scheme: state = [cap = k, inputs...] permuted once, output = state[1]
    (the circomlib shape: capacity element carries the arity tag).
    """
    k = inputs.shape[-2]
    t = k + 1
    assert t in R_PARTIAL, f"unsupported arity {k}"
    cap = F.from_int(FR, [k])[0]
    cap = jnp.broadcast_to(cap, inputs.shape[:-2] + (1, 16))
    state = jnp.concatenate([cap, inputs], axis=-2)
    return permute(state)[..., 1, :]


def hash2(a, b):
    """Merkle 2-to-1 compression: ([..., 16], [..., 16]) -> [..., 16]."""
    return hash_fes(jnp.stack([a, b], axis=-2))


def merkle_layer(leaves):
    """One Merkle level: [2n, 16] -> [n, 16] via batched hash2."""
    return hash2(leaves[0::2], leaves[1::2])


# --- host mirror ---------------------------------------------------------------


def host_permute(state, t: int | None = None):
    """Exact mirror of permute() on a list of Python ints (standard form)."""
    t = t or len(state)
    r = FR.modulus
    rc, mds = params_host(t)
    s = [v % r for v in state]
    half = R_FULL // 2
    r_p = R_PARTIAL[t]

    def sbox(v):
        return pow(v, 5, r)

    def mds_apply(s):
        return [sum(mds[i][j] * s[j] for j in range(t)) % r for i in range(t)]

    rnd = 0
    for _ in range(half):
        s = mds_apply([sbox((v + c) % r) for v, c in zip(s, rc[rnd])])
        rnd += 1
    for _ in range(r_p):
        s = [(v + c) % r for v, c in zip(s, rc[rnd])]
        s = mds_apply([sbox(s[0])] + s[1:])
        rnd += 1
    for _ in range(half):
        s = mds_apply([sbox((v + c) % r) for v, c in zip(s, rc[rnd])])
        rnd += 1
    return s


def host_hash(inputs):
    k = len(inputs)
    return host_permute([k] + list(inputs), k + 1)[1]


# --- Fr-native Fiat-Shamir transcript ------------------------------------------


def transcript_init(label: bytes):
    """Device transcript state [2, 16]: duplex sponge at t=3 (rate 2)."""
    seed = int.from_bytes(label, "little") % FR.modulus
    return _ts_device(seed)


@functools.lru_cache(maxsize=None)
def _ts_device(seed: int):
    return permute(F.from_int(FR, [2, seed, 0]).reshape(3, 16))[1:]


def transcript_absorb(state, fe_mont):
    """state [2, 16], fe [16] -> new state (duplex: add into rate lane 0)."""
    cap = F.from_int(FR, [2])[0]
    s = jnp.stack([cap, F.add(FR, state[0], fe_mont), state[1]])
    return permute(s)[1:]


def transcript_challenge(state):
    """-> (new_state, challenge fe [16]): squeeze rate lane 0, re-permute."""
    cap = F.from_int(FR, [3])[0]
    s = jnp.stack([cap, state[0], state[1]])
    out = permute(s)
    return out[1:], out[1]


class HostPoseidonTranscript:
    """Host mirror of the device transcript (same API as HostTranscript)."""

    def __init__(self, label: bytes):
        seed = int.from_bytes(label, "little") % FR.modulus
        self.state = host_permute([2, seed, 0])[1:]

    def absorb(self, value: int):
        s = host_permute([2, (self.state[0] + value) % FR.modulus,
                          self.state[1]])
        self.state = s[1:]

    def absorb_many(self, values):
        for v in values:
            self.absorb(v)

    def challenge(self) -> int:
        s = host_permute([3, self.state[0], self.state[1]])
        self.state = s[1:]
        return s[1]

    def challenges(self, n: int):
        return [self.challenge() for _ in range(n)]
