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


class ZkData(NamedTuple):
    """ZK attachments (spartan/src/zk.rs parity): per-sumcheck mask
    commitments + endpoint openings, mask sums, and the hiding witness
    opening replacing the plain PST13 one."""

    g1_comms: list              # [nv] (x, y) univariate KZG commitments
    g1_sum: int
    g1_vals: list               # per-variable u(rx_k) openings
    g1_proofs: list
    g2_comms: list
    g2_sum: int
    g2_vals: list
    g2_proofs: list
    w_hiding: object            # zk.HidingProof


class SpartanProof(NamedTuple):
    w_commitment: tuple         # (x, y) ints
    sumcheck1_msgs: list        # [nv][4] ints
    va: int
    vb: int
    vc: int
    sumcheck2_msgs: list        # [nv][3] ints
    w_eval: int
    val_m: int
    w_proof: object             # pst13.OpeningProof (None in zk mode)
    dfs: object = None          # optional DFSRoundProof (succinct val_m check)
    zk: object = None           # optional ZkData — proof is zero-knowledge


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


def _comb1_lv(f, ps):
    eq, az, bz, cz = ps
    return f.mul(eq, f.sub(f.mul(az, bz), cz))


_comb1.lv = _comb1_lv


def _comb2(polys):
    return F.mul(FR, polys[0], polys[1])


def _comb2_lv(f, ps):
    return f.mul(ps[0], ps[1])


_comb2.lv = _comb2_lv


def _msgs_to_ints(round_msgs):
    vals = F.to_int(FR, round_msgs)
    return [[int(v) for v in row] for row in vals]


def prove(index: SpartanIndex, srs: pst13.SRS, z_ints, dfs=None,
          zk_ctx=None, ckpt=None) -> SpartanProof:
    """Prove knowledge of a satisfying z (public witness path).

    ``z_ints``: full wire assignment (unpadded). The io region is public;
    only the w region is committed.

    ``zk_ctx``: optional (zk.ZkParams, random.Random) — produce a
    zero-knowledge proof: masked sumcheck round messages (committed mask
    polynomials opened at the endpoints) and a hiding, re-randomized
    witness commitment/opening. Maps spartan/src/zk.rs.

    ``ckpt``: optional checkpoint directory (or Checkpointer) — journal
    each phase so a preempted proof resumes instead of restarting
    (utils/checkpoint.py; the reference has no mid-proof recovery). The
    journal is keyed by a statement+witness digest, so a changed input
    starts fresh. Mutually exclusive with ``zk_ctx`` (the zk host-rng
    stream cannot skip phases).
    """
    from ..ops import zk as ZK
    from ..utils import checkpoint as CK

    if ckpt is not None and zk_ctx is not None:
        raise ValueError("checkpointing is not supported with zk_ctx")
    if isinstance(ckpt, CK.Checkpointer):
        ck = ckpt
    elif ckpt is not None:
        digest = CK.statement_digest(
            "spartan.prove", index.nv, len(z_ints),
            tuple(z_ints[:4]), sum(z_ints) % MOD, dfs is not None)
        ck = CK.Checkpointer(ckpt, digest, registry=_ckpt_registry())
    else:
        ck = CK.Checkpointer.disabled()

    r1cs = index.r1cs
    nv = index.nv
    zp = r1cs.pad_z(z_ints)
    _, w_ints = r1cs.split_io_w(zp)

    z_table = F.from_int(FR, zp)
    w_table = F.from_int(FR, w_ints)

    zk_params, zk_rng = zk_ctx if zk_ctx is not None else (None, None)

    # round 1: witness commitment (hiding in zk mode)
    if zk_ctx is not None:
        w_blinder = zk_rng.randrange(MOD)
        w_comm = ZK.hide_commit(srs, zk_params, w_table, w_blinder)
    else:
        w_comm = ck.phase("commit", lambda: pst13.commit(srs, w_table))
    ht = T.HostTranscript(LABEL)
    ht.absorb_point(w_comm.xy)

    zk1 = zk2 = None
    if zk_ctx is not None:
        g1_coeffs, g1_dev = ZK.generate_mask(zk_rng, nv, 3)
        g1_comms = ZK.commit_mask(zk_params, g1_coeffs)
        g1_sum = ZK.mask_sum_ints(g1_coeffs)
        for cm in g1_comms:
            ht.absorb_point(cm)
        ht.absorb(g1_sum)
        rho1 = ht.challenge()
        zk1 = (F.from_int(FR, rho1), g1_dev)

    state = ht.device_state()
    state, taus = T.challenge_fes(state, nv)

    # Az, Bz, Cz and first sumcheck (Dao-Thaler split-eq: the eq factor is
    # per-round suffix tables + scalars, never streamed/bound full-size)
    def _phase_sc1():
        az = index.da.mul_vec(z_table)
        bz = index.db.mul_vec(z_table)
        cz = index.dc.mul_vec(z_table)
        return SC.prove(FR, state, [az, bz, cz], degree=3,
                        comb=_comb1, zk_mask=zk1, eq_split=taus)

    res1 = ck.phase("sumcheck1", _phase_sc1)
    rx = res1.challenges
    va = res1.final_polys[0][0]
    vb = res1.final_polys[1][0]
    vc = res1.final_polys[2][0]

    state = res1.state
    g1_vals = g1_proofs = None
    if zk_ctx is not None:
        ht1 = T.HostTranscript.from_device_state(state)
        rx_ints = [int(v) for v in F.to_int(FR, res1.challenges)]
        g1_vals, g1_proofs = ZK.open_mask(zk_params, g1_coeffs, rx_ints)
        ht1.absorb_many(g1_vals)
        state = ht1.device_state()

    state = T.absorb_fes(FR, state, jnp.stack([va, vb, vc]))
    state, rabc = T.challenge_fes(state, 3)

    # M_rx(y) table and second sumcheck
    def _m_rx_table():
        eq_rx = P.eq_table(FR, rx)
        t = index.da.weighted_col_table(F.mul(FR, eq_rx, rabc[0]))
        t = F.add(FR, t, index.db.weighted_col_table(F.mul(FR, eq_rx,
                                                           rabc[1])))
        return F.add(FR, t, index.dc.weighted_col_table(F.mul(FR, eq_rx,
                                                              rabc[2])))

    if zk_ctx is not None:
        g2_coeffs, g2_dev = ZK.generate_mask(zk_rng, nv, 2)
        g2_comms = ZK.commit_mask(zk_params, g2_coeffs)
        g2_sum = ZK.mask_sum_ints(g2_coeffs)
        ht2a = T.HostTranscript.from_device_state(state)
        for cm in g2_comms:
            ht2a.absorb_point(cm)
        ht2a.absorb(g2_sum)
        rho2 = ht2a.challenge()
        zk2 = (F.from_int(FR, rho2), g2_dev)
        state = ht2a.device_state()

    res2 = ck.phase(
        "sumcheck2",
        lambda: SC.prove(FR, state, [_m_rx_table(), z_table], degree=2,
                         comb=_comb2, zk_mask=zk2),
    )
    ry = res2.challenges
    val_m = int(F.to_int(FR, res2.final_polys[0][0]))

    # witness opening at ry (hiding + re-randomized in zk mode)
    zk_data = None
    if zk_ctx is not None:
        ry_ints = [int(v) for v in F.to_int(FR, ry)]
        g2_vals, g2_proofs = ZK.open_mask(zk_params, g2_coeffs, ry_ints)
        htf = T.HostTranscript.from_device_state(res2.state)
        htf.absorb_many(g2_vals)
        res2 = res2._replace(state=htf.device_state())
        w_eval, w_hiding = ZK.hide_open(srs, zk_params, w_table, ry,
                                        w_blinder, zk_rng)
        w_proof = None
        zk_data = ZkData(
            g1_comms=g1_comms, g1_sum=g1_sum, g1_vals=g1_vals,
            g1_proofs=g1_proofs, g2_comms=g2_comms, g2_sum=g2_sum,
            g2_vals=g2_vals, g2_proofs=g2_proofs, w_hiding=w_hiding,
        )
    else:
        w_eval, w_proof = ck.phase(
            "opening", lambda: pst13.open_at(srs, w_table, ry))

    if dfs is not None:
        from . import spartan_dfs

        ht2 = T.HostTranscript.from_device_state(res2.state)
        ht2.absorb(w_eval)
        ht2.absorb(val_m)
        dfs_proof = ck.phase(
            "dfs",
            lambda: spartan_dfs.prove_round4(dfs, srs, ht2, rx, ry, rabc,
                                             res2.challenges),
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
        zk=zk_data,
    )


def _ckpt_registry():
    """NamedTuple classes the checkpoint decoder may encounter."""
    from . import spartan_dfs

    return {
        "Commitment": pst13.Commitment,
        "OpeningProof": pst13.OpeningProof,
        "SumcheckResult": SC.SumcheckResult,
        "DFSRoundProof": spartan_dfs.DFSRoundProof,
    }


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
    zk_params=None,
) -> bool:
    """Host verifier (Python ints). ``public_inputs``: io values WITHOUT the
    leading constant-1 wire. ``zk_params`` required iff the proof is zk."""
    from ..ops import zk as ZK

    r1cs = index.r1cs
    nv = index.nv
    zkd = proof.zk
    if (zkd is None) != (zk_params is None):
        return False
    try:
        ht = T.HostTranscript(LABEL)
        ht.absorb_point(proof.w_commitment)
        rho1 = rho2 = 0
        if zkd is not None:
            for cm in zkd.g1_comms:
                ht.absorb_point(cm)
            ht.absorb(zkd.g1_sum)
            rho1 = ht.challenge()
        taus = ht.challenges(nv)

        claim1 = rho1 * zkd.g1_sum % MOD if zkd is not None else 0
        rx, expected1 = SC.verify(proof.sumcheck1_msgs, claim1, ht)
        eq_tau_rx = _eq_eval_ints(taus, rx)
        want1 = (proof.va * proof.vb - proof.vc) % MOD * eq_tau_rx % MOD
        if zkd is not None:
            if not ZK.verify_mask(zk_params, zkd.g1_comms, rx, zkd.g1_vals,
                                  zkd.g1_proofs):
                return False
            want1 = (want1 + rho1 * (sum(zkd.g1_vals) % MOD)) % MOD
            ht.absorb_many(zkd.g1_vals)
        if expected1 != want1:
            return False

        ht.absorb_many([proof.va, proof.vb, proof.vc])
        ra, rb, rc = ht.challenges(3)
        claim2 = (ra * proof.va + rb * proof.vb + rc * proof.vc) % MOD
        if zkd is not None:
            for cm in zkd.g2_comms:
                ht.absorb_point(cm)
            ht.absorb(zkd.g2_sum)
            rho2 = ht.challenge()
            claim2 = (claim2 + rho2 * zkd.g2_sum) % MOD
        ry, expected2 = SC.verify(proof.sumcheck2_msgs, claim2, ht)

        # z(ry) = io(ry) + w(ry)
        eq_ry = _eq_table_ints(ry)
        io_vals = [1] + [int(v) % MOD for v in public_inputs]
        io_eval = sum(v * eq_ry[i] for i, v in enumerate(io_vals)) % MOD
        z_ry = (io_eval + proof.w_eval) % MOD
        want2 = proof.val_m * z_ry % MOD
        if zkd is not None:
            if not ZK.verify_mask(zk_params, zkd.g2_comms, ry, zkd.g2_vals,
                                  zkd.g2_proofs):
                return False
            want2 = (want2 + rho2 * (sum(zkd.g2_vals) % MOD)) % MOD
            ht.absorb_many(zkd.g2_vals)
        if expected2 != want2:
            return False

        # witness opening: hiding check in zk mode, plain PST13 otherwise
        if zkd is not None:
            if not ZK.hide_check(srs, zk_params,
                                 pst13.Commitment(proof.w_commitment), ry,
                                 proof.w_eval, zkd.w_hiding):
                return False
        elif not pst13.verify(
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
