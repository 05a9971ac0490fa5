"""Shared-witness PCS helpers: per-party commit/open with G1 merges.

Maps the reference's Rep3CommitmentScheme behavior
(co-jolt/src/poly/commitment/pst13.rs: commitment = sum of 3 party
commitments over share-a; coordinate_prove sums proof shares pointwise) and
co-spartan's combine_comm/aggregate_proof. Used by co_spartan and the Rep3
Jolt provers.
"""

from __future__ import annotations

from ..ops import pst13
from ..ops import ref_bn254 as bn
from ..ops.field import FR

MOD = FR.modulus


def commit_shares(srs: pst13.SRS, stack) -> pst13.Commitment:
    """Commit each party's share [3, n, 16]; G1-sum = commitment of the value."""
    return commit_shares_batch(srs, [stack])[0]


def commit_shares_batch(srs: pst13.SRS, stacks) -> list:
    """Batched commit_shares: every party MSM of every stack dispatches
    before any host fetch (two blocking rounds total via msm_batch_ints);
    the 3 per-party G1 points of each stack sum on the host."""
    from ..ops import msm as M

    jobs = []
    for st in stacks:
        nv = st.shape[1].bit_length() - 1
        lvl = srs.level(srs.nv - nv)
        for p in range(3):
            jobs.append((lvl, st[p]))
    coords = M.msm_batch_ints(jobs)
    out = []
    for i in range(len(stacks)):
        acc = None
        for p in range(3):
            acc = bn.add(acc, bn.g1_from_coords(coords[3 * i + p]))
        out.append(pst13.Commitment(xy=bn.g1_coords(acc)))
    return out


def open_shares(srs: pst13.SRS, stack, point):
    """Per-party PST13 openings; value and proof points sum across parties."""
    vals, proofs = [], []
    for p in range(3):
        v, pr = pst13.open_at(srs, stack[p], point)
        vals.append(v)
        proofs.append(pr)
    value = sum(vals) % MOD
    nv = len(proofs[0].pis)
    pis = []
    for k in range(nv):
        acc = None
        for pr in proofs:
            acc = bn.add(acc, bn.g1_from_coords(pr.pis[k]))
        pis.append(bn.g1_coords(acc))
    return value, pst13.OpeningProof(pis=tuple(pis))


def batch_open_shares(srs: pst13.SRS, stacks, eta_mont, point):
    """eta-RLC batch opening over share stacks (sums the per-party proofs)."""
    import jax.numpy as jnp

    from ..ops import field as F
    from ..ops import poly as P

    k = len(stacks)
    etas = [F.ones_mont(FR)]
    for _ in range(k - 1):
        etas.append(F.mul(FR, etas[-1], eta_mont))
    coeffs = jnp.stack(etas)
    vals, proofs = [], []
    for p in range(3):
        agg = P.linear_combination(
            FR, coeffs, jnp.stack([s[p] for s in stacks])
        )
        v, pr = pst13.open_at(srs, agg, point)
        vals.append(v)
        proofs.append(pr)
    value = sum(vals) % MOD
    nv = len(proofs[0].pis)
    pis = []
    for j in range(nv):
        acc = None
        for pr in proofs:
            acc = bn.add(acc, bn.g1_from_coords(pr.pis[j]))
        pis.append(bn.g1_coords(acc))
    return value, pst13.OpeningProof(pis=tuple(pis))
