"""Generic sumcheck engine over MLE evaluation tables (public or Rep3-shared).

Prover rounds (maps ark-linear-sumcheck's IPForMLSumcheck and the reference's
specialized Rep3 folds — co-spartan/src/sumcheck.rs:171-395, co-jolt
subprotocols/sumcheck.rs):

  round j over tables of 2h entries: for each table p, its restriction to
  x_0 = t is the vector p_t = even + t*(odd - even); the round message is
  s_j(t) = sum_half comb(p_t) for t = 0..degree — (degree+1) evaluations.
  Fiat-Shamir absorbs the evaluations, squeezes r_j, and every table binds
  x_0 <- r_j (reusing the slopes).

Conventions:
- element axis is ALWAYS axis -2 (tables are [..., n, 16]); a Rep3-shared
  table carries its party axis in the leading dims ([3, n, 16]) and the
  engine opens round evaluations by summing over axis 0 (+ zero-share masks
  from correlated rng) before they touch the transcript — the MPC and
  plaintext sumchecks share this one implementation.
- ``comb`` receives the per-table restrictions and must return either a
  public [..., h, 16] array or an additive-share stack [3, h, 16]; for
  share*share products the caller uses the Rep3 3-term formula (mpc.mul).

The host verifier (``verify``) interpolates each round polynomial from its
evaluations and walks the same transcript — used by models/*/verifier.py.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from . import field as F
from . import transcript as T
from .field import FR, FieldSpec

_round_fn_cache = {}

# below this element count, rounds run at a FIXED padded shape (bound tables
# are zero-padded back up), so XLA compiles ONE kernel per comb instead of
# one per table size. Requires comb(all-zero restrictions) == 0, which holds
# for every comb in this framework (each has a zero-padded eq/public factor).
FIXED_CUTOFF = 1 << 8


def _elem_slice(p, sl):
    return p[..., sl, :]


def _pad_elems(p, target):
    h = p.shape[-2]
    if h == target:
        return p
    pad = [(0, 0)] * p.ndim
    pad[-2] = (0, target - h)
    return jnp.pad(p, pad)


def _make_round_fn(spec: FieldSpec, degree: int, comb, shared: bool,
                   repad: bool = False):
    """Build (and jit) the per-round kernel for a given comb function.

    ``repad=True`` keeps the output tables at the INPUT shape by zero-padding
    the bound halves back up — the fixed-shape small-round regime.
    """

    def round_fn(state, polys, mask=None, consts=None):
        evens = [_elem_slice(p, slice(0, None, 2)) for p in polys]
        odds = [_elem_slice(p, slice(1, None, 2)) for p in polys]
        slopes = [F.sub(spec, o, e) for o, e in zip(odds, evens)]
        cur = list(evens)
        msgs = []
        for t in range(degree + 1):
            if t > 0:
                cur = [F.add(spec, c, s) for c, s in zip(cur, slopes)]
            v = comb(cur) if consts is None else comb(cur, consts)  # [..., h, 16]
            ev = F.modsum(spec, v, v.ndim - 2)  # sum over element axis
            msgs.append(ev)
        msg = jnp.stack(msgs, axis=-2)  # [..., degree+1, 16]
        if shared:
            if mask is not None:
                msg = F.add(spec, msg, mask)
            opened = msg[0]
            for p in range(1, msg.shape[0]):
                opened = F.add(spec, opened, msg[p])
            msg = opened  # [degree+1, 16]
        state = T.absorb_fes(spec, state, msg)
        state, r = T.challenge_fe(state)
        bound = [
            F.add(spec, e, F.mul(spec, jnp.broadcast_to(r, s.shape), s))
            for e, s in zip(evens, slopes)
        ]
        if repad:
            bound = [_pad_elems(b, polys[0].shape[-2]) for b in bound]
        return state, r, msg, bound

    return jax.jit(round_fn)


class SumcheckResult(NamedTuple):
    state: jax.Array          # transcript state after all rounds
    challenges: jax.Array     # [nv, 16] Montgomery
    round_msgs: jax.Array     # [nv, degree+1, 16] public round evaluations
    final_polys: list         # each [..., 1, 16] — tables bound at r


def prove(
    spec: FieldSpec,
    state,
    polys: Sequence[jax.Array],
    degree: int,
    comb: Callable,
    masks=None,
    shared: bool = False,
    consts=None,
) -> SumcheckResult:
    """Run all sumcheck rounds. ``polys`` tables must share element length 2^nv.

    ``masks``: optional [nv, 3, degree+1, 16] zero-share stacks (ZK/MPC
    re-randomization of round messages; sums to zero so the opened transcript
    values are unchanged).
    """
    n = polys[0].shape[-2]
    nv = n.bit_length() - 1
    assert 1 << nv == n
    key = (spec, degree, comb, shared)
    if key not in _round_fn_cache:
        _round_fn_cache[key] = _make_round_fn(spec, degree, comb, shared)
    key_f = (spec, degree, comb, shared, "fixed")
    if key_f not in _round_fn_cache:
        _round_fn_cache[key_f] = _make_round_fn(
            spec, degree, comb, shared, repad=True
        )
    round_fn = _round_fn_cache[key]
    fixed_fn = _round_fn_cache[key_f]

    in_fixed = False
    rs, msgs = [], []
    for j in range(nv):
        h = n >> j
        if not in_fixed and h <= FIXED_CUTOFF:
            # enter the fixed-shape regime: pad every table to the cutoff
            polys = [_pad_elems(p, FIXED_CUTOFF) for p in polys]
            in_fixed = True
        mask = None if masks is None else masks[j]
        fn = fixed_fn if in_fixed else round_fn
        state, r, msg, polys = fn(state, polys, mask, consts)
        rs.append(r)
        msgs.append(msg)
    if in_fixed:
        # bound values live in the active prefix; index 0 is the final value
        polys = [_elem_slice(p, slice(0, 1)) for p in polys]
    return SumcheckResult(
        state=state,
        challenges=jnp.stack(rs),
        round_msgs=jnp.stack(msgs),
        final_polys=polys,
    )


def round_msgs_to_ints(round_msgs):
    """Device round messages [nv, d+1, 16] -> [[int]] for proof objects."""
    vals = F.to_int(FR, round_msgs)
    return [[int(v) for v in row] for row in vals]


# --- host-side verification -------------------------------------------------


def lagrange_eval_ints(evals, x: int, modulus: int) -> int:
    """Interpolate the degree-d poly through (i, evals[i]) and evaluate at x."""
    d = len(evals) - 1
    total = 0
    for i in range(d + 1):
        num, den = 1, 1
        for j in range(d + 1):
            if i == j:
                continue
            num = num * (x - j) % modulus
            den = den * (i - j) % modulus
        total = (total + evals[i] * num * pow(den, -1, modulus)) % modulus
    return total


def verify(
    round_msgs,
    claim: int,
    transcript: "T.HostTranscript",
    modulus: int = FR.modulus,
):
    """Walk the rounds on the host: check s(0)+s(1) == claim, derive r_j.

    ``round_msgs``: [nv][degree+1] ints. Returns (challenges, final_claim).
    Raises ValueError on a failed round check.
    """
    rs = []
    for j, evals in enumerate(round_msgs):
        if (evals[0] + evals[1]) % modulus != claim % modulus:
            raise ValueError(f"sumcheck round {j}: s(0)+s(1) != claim")
        transcript.absorb_many(evals)
        r = transcript.challenge()
        claim = lagrange_eval_ints(evals, r, modulus)
        rs.append(r)
    return rs, claim
