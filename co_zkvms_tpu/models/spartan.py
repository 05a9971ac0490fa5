"""Spartan R1CS SNARK (DFS scheme): TPU prover + host verifier.

Protocol (capability-parity with the reference's spartan crate; proof shape
mirrors R1CSProof — spartan/src/lib.rs:25-41, verifier flow verifier.rs:32-153):

  1. commit the witness MLE w (PST13); absorb; squeeze tau [nv].
  2. sumcheck 1 (deg 3):  0 = sum_x eq(tau,x) * (Az(x)*Bz(x) - Cz(x))
     -> r_x, claims va, vb, vc; check eval = (va*vb - vc) * eq(tau, r_x).
  3. squeeze ra, rb, rc; sumcheck 2 (deg 2) over y of M_rx(y) * z(y), where
     M_rx(y) = sum_m r_m * M_m(r_x, y); claimed sum = ra*va + rb*vb + rc*vc.
  4. -> r_y; open w(r_y) (PST13), send val_m = M_rx(r_y);
     check eval2 = val_m * (io(r_y) + w(r_y)).
  5. val_m correctness: verifier recomputes M(r_x, r_y) from the sparse
     matrices (O(nnz + 2^nv) host work). [The succinct variant — committed
     row/col/val oracles + logup, reference round 4 — is layered on top in
     models/spartan_logup.py.]

Everything the prover does that is O(2^nv) — eq tables, Az/Bz/Cz scatter
sums, sumcheck folds, MSMs — runs on device; the transcript also lives on
device during sumchecks (no host round-trips per round, unlike the
reference's coordinator loop).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import field as F
from ..ops import poly as P
from ..ops import pst13
from ..ops import sumcheck as SC
from ..ops import transcript as T
from ..ops.field import FR
from .r1cs import R1CS, DeviceMatrix, _eq_table_ints

MOD = FR.modulus
LABEL = b"co_zkvms_tpu/spartan/v1"


class SpartanProof(NamedTuple):
    w_commitment: tuple         # (x, y) ints
    sumcheck1_msgs: list        # [nv][4] ints
    va: int
    vb: int
    vc: int
    sumcheck2_msgs: list        # [nv][3] ints
    w_eval: int
    val_m: int
    w_proof: pst13.OpeningProof
    dfs: object = None          # optional DFSRoundProof (succinct val_m check)


class SpartanIndex(NamedTuple):
    """Prover/verifier key: device-lowered matrices + dimensions."""

    r1cs: R1CS
    nv: int
    da: DeviceMatrix
    db: DeviceMatrix
    dc: DeviceMatrix

    @classmethod
    def from_r1cs(cls, r1cs: R1CS):
        nv = r1cs.nv
        n = 1 << nv
        return cls(
            r1cs=r1cs,
            nv=nv,
            da=DeviceMatrix.from_sparse(r1cs.a, n, n),
            db=DeviceMatrix.from_sparse(r1cs.b, n, n),
            dc=DeviceMatrix.from_sparse(r1cs.c, n, n),
        )


def _comb1(polys):
    eq, az, bz, cz = polys
    return F.mul(FR, eq, F.sub(FR, F.mul(FR, az, bz), cz))


def _comb2(polys):
    return F.mul(FR, polys[0], polys[1])


def _msgs_to_ints(round_msgs):
    vals = F.to_int(FR, round_msgs)
    return [[int(v) for v in row] for row in vals]


def prove(index: SpartanIndex, srs: pst13.SRS, z_ints, dfs=None) -> SpartanProof:
    """Prove knowledge of a satisfying z (public witness path).

    ``z_ints``: full wire assignment (unpadded). The io region is public;
    only the w region is committed.
    """
    r1cs = index.r1cs
    nv = index.nv
    zp = r1cs.pad_z(z_ints)
    _, w_ints = r1cs.split_io_w(zp)

    z_table = F.from_int(FR, zp)
    w_table = F.from_int(FR, w_ints)

    # round 1: witness commitment
    w_comm = pst13.commit(srs, w_table)
    ht = T.HostTranscript(LABEL)
    ht.absorb_point(w_comm.xy)
    state = ht.device_state()
    state, taus = T.challenge_fes(state, nv)

    # Az, Bz, Cz and first sumcheck
    eq_tau = P.eq_table(FR, taus)
    az = index.da.mul_vec(z_table)
    bz = index.db.mul_vec(z_table)
    cz = index.dc.mul_vec(z_table)
    res1 = SC.prove(FR, state, [eq_tau, az, bz, cz], degree=3, comb=_comb1)
    rx = res1.challenges
    va = res1.final_polys[1][0]
    vb = res1.final_polys[2][0]
    vc = res1.final_polys[3][0]

    state = T.absorb_fes(FR, res1.state, jnp.stack([va, vb, vc]))
    state, rabc = T.challenge_fes(state, 3)

    # M_rx(y) table and second sumcheck
    eq_rx = P.eq_table(FR, rx)
    m_rx = index.da.weighted_col_table(F.mul(FR, eq_rx, rabc[0]))
    m_rx = F.add(FR, m_rx, index.db.weighted_col_table(F.mul(FR, eq_rx, rabc[1])))
    m_rx = F.add(FR, m_rx, index.dc.weighted_col_table(F.mul(FR, eq_rx, rabc[2])))
    res2 = SC.prove(FR, state, [m_rx, z_table], degree=2, comb=_comb2)
    ry = res2.challenges
    val_m = int(F.to_int(FR, res2.final_polys[0][0]))

    # witness opening at ry
    w_eval, w_proof = pst13.open_at(srs, w_table, ry)

    if dfs is not None:
        from . import spartan_dfs

        ht2 = T.HostTranscript.from_device_state(res2.state)
        ht2.absorb(w_eval)
        ht2.absorb(val_m)
        dfs_proof = spartan_dfs.prove_round4(
            dfs, srs, ht2, rx, ry, rabc, res2.challenges
        )
    else:
        dfs_proof = None

    return SpartanProof(
        w_commitment=w_comm.xy,
        sumcheck1_msgs=_msgs_to_ints(res1.round_msgs),
        va=int(F.to_int(FR, va)),
        vb=int(F.to_int(FR, vb)),
        vc=int(F.to_int(FR, vc)),
        sumcheck2_msgs=_msgs_to_ints(res2.round_msgs),
        w_eval=w_eval,
        val_m=val_m,
        w_proof=w_proof,
        dfs=dfs_proof,
    )


def _eq_eval_ints(r, s):
    acc = 1
    for a, b in zip(r, s):
        acc = acc * (a * b + (1 - a) * (1 - b)) % MOD
    return acc


def verify(
    index: SpartanIndex,
    srs: pst13.SRS,
    public_inputs,
    proof: SpartanProof,
    dfs_vk=None,
) -> bool:
    """Host verifier (Python ints). ``public_inputs``: io values WITHOUT the
    leading constant-1 wire."""
    r1cs = index.r1cs
    nv = index.nv
    try:
        ht = T.HostTranscript(LABEL)
        ht.absorb_point(proof.w_commitment)
        taus = ht.challenges(nv)

        rx, expected1 = SC.verify(proof.sumcheck1_msgs, 0, ht)
        eq_tau_rx = _eq_eval_ints(taus, rx)
        if expected1 != (proof.va * proof.vb - proof.vc) % MOD * eq_tau_rx % MOD:
            return False

        ht.absorb_many([proof.va, proof.vb, proof.vc])
        ra, rb, rc = ht.challenges(3)
        claim2 = (ra * proof.va + rb * proof.vb + rc * proof.vc) % MOD
        ry, expected2 = SC.verify(proof.sumcheck2_msgs, claim2, ht)

        # z(ry) = io(ry) + w(ry)
        eq_ry = _eq_table_ints(ry)
        io_vals = [1] + [int(v) % MOD for v in public_inputs]
        io_eval = sum(v * eq_ry[i] for i, v in enumerate(io_vals)) % MOD
        z_ry = (io_eval + proof.w_eval) % MOD
        if expected2 != proof.val_m * z_ry % MOD:
            return False

        # PST13 witness opening
        if not pst13.verify(
            srs, pst13.Commitment(proof.w_commitment), ry, proof.w_eval, proof.w_proof
        ):
            return False

        # val_m consistency: succinct (logup round) when present, else direct
        if proof.dfs is not None and dfs_vk is None:
            return False
        if proof.dfs is not None:
            from . import spartan_dfs

            ht.absorb(proof.w_eval)
            ht.absorb(proof.val_m)
            return spartan_dfs.verify_round4(
                dfs_vk, srs, ht, proof.dfs, rx, ry, [ra, rb, rc], proof.val_m
            )
        val = (
            ra * r1cs.a.eval_mle(rx, ry)
            + rb * r1cs.b.eval_mle(rx, ry)
            + rc * r1cs.c.eval_mle(rx, ry)
        ) % MOD
        return val == proof.val_m
    except ValueError:
        return False
