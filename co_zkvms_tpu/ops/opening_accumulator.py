"""Batched opening accumulator: many (poly, point, value) claims -> one proof.

Maps co-jolt's Rep3ProverOpeningAccumulator / Jolt's opening reduction
(poly/opening_proof.rs:63-438 — SURVEY.md §2.8): openings of k committed
polynomials at k different points reduce to ONE PST13 opening via

  sum_i rho^i * v_i  =  sum_x [ sum_i rho^i * eq(r_i, x) * p_i(x) ]

— a degree-2 sumcheck over the common domain; at its endpoint z the claims
p_i(z) are eta-RLC batched into a single PST13 opening. Works for public
tables and Rep3 share stacks (per-party proofs merged by mpc_pcs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import field as F
from . import poly as P
from . import pst13
from . import sumcheck as SC
from . import transcript as T
from .field import FR

MOD = FR.modulus
LABEL = b"co_zkvms_tpu/opening_accumulator/v1"


class ReducedOpeningProof(NamedTuple):
    sumcheck_msgs: list         # [nv][3] ints
    z_evals: list               # p_i(z) for each claim
    batch_proof: pst13.OpeningProof


def _comb_stacked(polys, consts=None):
    """Stacked reduction comb: claims enter as ONE [k, h, 16] tensor pair.

    The claim count k is a leading array dim, not unrolled XLA graph — one
    small kernel serves any number of accumulated claims (Jolt routes ~150
    through here; an unrolled comb would recompile per k and blow up the
    graph the way the reference's per-poly appends do not).
    """
    del consts
    eqs, tabs = polys                     # [k, h, 16] each; eqs pre-scaled
    return F.modsum(FR, F.mul(FR, eqs, tabs), 0)


def _comb_stacked_shared(polys, consts=None):
    """Rep3 variant: tabs is a [3, k, h, 16] share stack, eqs stays public;
    every product is public*share (linear), so no share-mul rounds — the
    round messages are additive shares the engine masks and opens."""
    del consts
    eqs, tabs = polys
    return F.modsum(FR, F.mul(FR, eqs[None], tabs), 1)


def reduce_and_prove(ht: T.HostTranscript, claims, srs: pst13.SRS,
                     shared: bool = False, masks_rng=None,
                     mask_base: int = 0):
    """``claims``: list of (table [2^nv,16] (or [3,2^nv,16] share stack),
    point [nv,16] device, value int).

    All tables share one domain size. Absorbs values, runs the reduction
    sumcheck on-device, batch-opens at its endpoint. Returns the proof.
    Maps Rep3ProverOpeningAccumulator::reduce_and_prove[_worker]
    (poly/opening_proof.rs:182-291).
    """
    from ..parallel import shares as Sh
    from ..models import mpc_pcs

    k = len(claims)
    for _, _, v in claims:
        ht.absorb(v)
    rho = ht.challenge()
    rhos = F.from_int(FR, [pow(rho, i, MOD) for i in range(k)])

    # pre-scale each eq table by its rho power so the kernel is a plain
    # sum_k eq_k * p_k  — rho batching costs nothing inside the rounds
    n = claims[0][0].shape[-2]
    eqs = jnp.stack([
        F.mul(FR, jnp.broadcast_to(rhos[i], (n, F.NLIMBS)),
              P.eq_table(FR, claims[i][1]))
        for i in range(k)
    ])
    tabs = jnp.stack([t for t, _, _ in claims], axis=1 if shared else 0)

    masks = None
    if shared and masks_rng is not None:
        nv = n.bit_length() - 1
        masks = jnp.stack([
            masks_rng.zero_shares(FR, mask_base + j, (3,))
            for j in range(nv)
        ])
    res = SC.prove(
        FR, ht.device_state(), [eqs, tabs], degree=2,
        comb=_comb_stacked_shared if shared else _comb_stacked,
        masks=masks, shared=shared,
    )
    ht.state = T.HostTranscript.from_device_state(res.state).state
    z = res.challenges

    finals = res.final_polys[1][..., 0, :]          # [k,16] or [3,k,16]
    if shared:
        finals = Sh.combine(FR, finals)
    final_tabs = F.to_int(FR, finals)
    z_evals = []
    for i in range(k):
        z_evals.append(int(final_tabs[i]))
        ht.absorb(z_evals[i])
    eta = ht.challenge()
    opener = mpc_pcs.batch_open_shares if shared else pst13.batch_open
    _, batch_proof = opener(
        srs, [t for t, _, _ in claims], F.from_int(FR, eta), z
    )
    return ReducedOpeningProof(
        sumcheck_msgs=SC.round_msgs_to_ints(res.round_msgs),
        z_evals=z_evals,
        batch_proof=batch_proof,
    )


def _eq_eval_ints(r, s):
    acc = 1
    for a, b in zip(r, s):
        acc = acc * (a * b + (1 - a) * (1 - b)) % MOD
    return acc


def verify(ht: T.HostTranscript, claims, comms, proof: ReducedOpeningProof,
           srs: pst13.SRS) -> bool:
    """``claims``: [(point_ints, value_int)]; ``comms``: [Commitment]."""
    k = len(claims)
    for _, v in claims:
        ht.absorb(v)
    rho = ht.challenge()
    batched_claim = sum(
        pow(rho, i, MOD) * v for i, (_, v) in enumerate(claims)
    ) % MOD
    try:
        z, expected = SC.verify(proof.sumcheck_msgs, batched_claim, ht)
    except ValueError:
        return False
    got = 0
    for i, (point, _) in enumerate(claims):
        got = (got + pow(rho, i, MOD) * _eq_eval_ints(point, z)
               * proof.z_evals[i]) % MOD
    if got != expected:
        return False
    for v in proof.z_evals:
        ht.absorb(v)
    eta = ht.challenge()
    agg = pst13.aggregate_evals_ints(eta, proof.z_evals)
    return pst13.batch_verify(srs, comms, proof.z_evals, eta, z, agg,
                              proof.batch_proof)
