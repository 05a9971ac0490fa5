"""co-Spartan: 3-party Rep3 MPC Spartan prover as one sharded array program.

Replaces the reference's coordinator + 3xW QUIC workers
(co-spartan/src/{coordinator,worker}.rs — SURVEY.md §2.6/§3.1) with a single
jax program over share stacks [3, N, 16]:

- witness sharing: w is Rep3-shared; z = trivial(io) + w_shares (party 0
  carries the public io region, matching additive.rs's party-0 convention);
- each party commits its w share (3 MSMs run batched over the party axis'
  leading dim); the witness commitment is their G1 sum — the reference's
  ``combine_comm``;
- sumcheck 1 runs the SHARED engine: az*bz uses the Rep3 3-term local
  product, round messages are additive shares masked by correlated-rng zero
  shares and opened into the (device) transcript — what the reference does
  with one coordinator RTT per round (coordinator.rs:642-716) is here a
  party-axis reduction;
- sumcheck 2's M_rx(y) table is public (matrix + r_x only), z stays shared;
- PST13 opening: parties open their shares, proofs sum pointwise
  (pst13.rs coordinate_prove behavior).

Output: the SAME SpartanProof, verified by models/spartan.verify — and
bit-identical to the single-party proof for the same witness (the masks
cancel in every opened value), which is the conformance obligation the
reference states for co-Jolt (SURVEY.md §3.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops import poly as P
from ..ops import pst13
from ..ops import ref_bn254 as bn
from ..ops import sumcheck as SC
from ..ops import transcript as T
from ..ops.field import FR
from ..parallel import mpc, shares as S
from ..parallel.rng import CorrelatedRng
from .spartan import (
    LABEL,
    SpartanIndex,
    SpartanProof,
    _comb2,
    _msgs_to_ints,
)

MOD = FR.modulus


def share_witness(index: SpartanIndex, z_ints, key):
    """Split z into io (public) + Rep3-shared w. Returns (io_table, z_shares,
    w_shares)."""
    r1cs = index.r1cs
    zp = r1cs.pad_z(z_ints)
    io_ints, w_ints = r1cs.split_io_w(zp)
    io_table = F.from_int(FR, io_ints)
    w_shares = S.share(FR, key, F.from_int(FR, w_ints))
    z_shares = F.add(FR, S.promote_public(FR, io_table), w_shares)
    return io_table, z_shares, w_shares


def _comb1_shared(polys, consts, chunk_i, t_idx):
    """Outer comb with a fresh correlated zero share on the az*bz reshare
    (mask-on-every-reshare, rep3/arithmetic.rs:39-48), derived in-kernel per
    (round, chunk, t)."""
    from ..parallel.rng import zero_shares_from_keys

    eq, az, bz, cz = polys
    key_data, rctr = consts
    mask = zero_shares_from_keys(FR, key_data, az.shape[1:-1],
                                 rctr, chunk_i, t_idx)
    prod = mpc.mul(FR, az, bz, zero_mask=mask)
    return F.mul(FR, eq, F.sub(FR, prod, cz))


_comb1_shared.wants_ctr = True


# per-party commit/open share merges live in models/mpc_pcs.py (the Rep3
# CommitmentScheme analog); co_spartan delegates to them.
from . import mpc_pcs as _mpc_pcs

_commit_shares = _mpc_pcs.commit_shares
_open_shares = _mpc_pcs.open_shares


def prove_rep3(
    index: SpartanIndex,
    srs: pst13.SRS,
    z_ints,
    share_key=None,
    mask_key=None,
    mesh=None,
    dfs=None,
    zk_ctx=None,
    witness=None,
    ckpt=None,
) -> SpartanProof:
    """3-party MPC Spartan prove (in-process simulation of all parties).

    ``mesh``: optional jax Mesh with a "party" axis (size 3) and/or a
    "chunk" axis — the share stacks are placed
    P("party", "chunk") and every protocol op runs GSPMD-sharded; the chunk
    axis is the reference's worker axis (split_poly), the party axis its
    Rep3 ring.

    ``zk_ctx``: optional (zk.ZkParams, random.Random) — zero-knowledge MPC
    proof. The zk machinery is coordinator-side throughout (matching the
    reference, where masks live with the coordinator —
    co-spartan/src/coordinator.rs:184-228,593-745): the witness commitment is
    hidden by adding blinder*g^beta to the COMBINED share commitment, round
    messages gain the committed mask polynomial's closed-form contribution
    after the party-sum opening, and the combined opening proof is
    re-randomized — no step materializes the witness. The proof is
    bit-identical to the single-party zk proof for the same zk rng stream.
    """
    from ..ops import zk as ZK
    from ..utils import checkpoint as CK

    if ckpt is not None and zk_ctx is not None:
        raise ValueError("checkpointing is not supported with zk_ctx")
    if isinstance(ckpt, CK.Checkpointer):
        ck = ckpt
    elif ckpt is not None:
        from .spartan import _ckpt_registry

        digest = CK.statement_digest(
            "co_spartan.prove_rep3", index.nv,
            "artifact" if z_ints is None else
            (len(z_ints), tuple(z_ints[:4]), sum(z_ints) % MOD),
            dfs is not None)
        ck = CK.Checkpointer(ckpt, digest, registry=_ckpt_registry())
    else:
        ck = CK.Checkpointer.disabled()

    nv = index.nv
    share_key = share_key if share_key is not None else jax.random.key(0)
    mask_key = mask_key if mask_key is not None else jax.random.key(1)
    if witness is not None:
        # pre-distributed shares (per-chunk artifacts — utils/artifacts.py);
        # already placed on the mesh by the loader
        io_table, z_shares, w_shares = witness
    else:
        io_table, z_shares, w_shares = share_witness(index, z_ints,
                                                     share_key)
    if mesh is not None and witness is None:
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        party = "party" if "party" in mesh.shape else None
        chunk = "chunk" if "chunk" in mesh.shape else None
        spec = NamedSharding(mesh, Pspec(party, chunk))
        z_shares = jax.device_put(z_shares, spec)
        w_shares = jax.device_put(w_shares, spec)
    crng = CorrelatedRng.create(mask_key)
    zk_params, zk_rng = zk_ctx if zk_ctx is not None else (None, None)

    w_comm = ck.phase("commit", lambda: _commit_shares(srs, w_shares))
    if zk_ctx is not None:
        w_blinder = zk_rng.randrange(MOD)
        w_comm = ZK.hide_commitment(zk_params, w_comm, w_blinder)
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

    az = index.da.mul_vec(z_shares)
    bz = index.db.mul_vec(z_shares)
    cz = index.dc.mul_vec(z_shares)

    masks1 = jnp.stack([crng.zero_shares(FR, j, (4,)) for j in range(nv)])
    res1 = ck.phase("sumcheck1", lambda: SC.prove(
        FR,
        state,
        [az, bz, cz],
        degree=3,
        comb=_comb1_shared,
        masks=masks1,
        shared=True,
        zk_mask=zk1,
        round_consts=[(crng.key_data, jnp.uint32(500_000 + j))
                      for j in range(nv)],
        eq_split=taus,
    ))
    rx = res1.challenges
    va = S.combine(FR, res1.final_polys[0])[0]
    vb = S.combine(FR, res1.final_polys[1])[0]
    vc = S.combine(FR, res1.final_polys[2])[0]

    state = res1.state
    g1_vals = g1_proofs = None
    if zk_ctx is not None:
        ht1 = T.HostTranscript.from_device_state(state)
        rx_ints = [int(v) for v in F.to_int(FR, rx)]
        g1_vals, g1_proofs = ZK.open_mask(zk_params, g1_coeffs, rx_ints)
        ht1.absorb_many(g1_vals)
        state = ht1.device_state()

    state = T.absorb_fes(FR, state, jnp.stack([va, vb, vc]))
    state, rabc = T.challenge_fes(state, 3)

    eq_rx = P.eq_table(FR, rx)
    m_rx = index.da.weighted_col_table(F.mul(FR, eq_rx, rabc[0]))
    m_rx = F.add(FR, m_rx, index.db.weighted_col_table(F.mul(FR, eq_rx, rabc[1])))
    m_rx = F.add(FR, m_rx, index.dc.weighted_col_table(F.mul(FR, eq_rx, rabc[2])))

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

    masks2 = jnp.stack([crng.zero_shares(FR, 1000 + j, (3,)) for j in range(nv)])
    res2 = ck.phase("sumcheck2", lambda: SC.prove(
        FR,
        state,
        [m_rx, z_shares],
        degree=2,
        comb=_comb2_shared,
        masks=masks2,
        shared=True,
        zk_mask=zk2,
    ))
    ry = res2.challenges
    val_m = int(F.to_int(FR, res2.final_polys[0][0]))

    zk_data = None
    if zk_ctx is not None:
        from .spartan import ZkData

        ry_ints = [int(v) for v in F.to_int(FR, ry)]
        g2_vals, g2_proofs = ZK.open_mask(zk_params, g2_coeffs, ry_ints)
        htf = T.HostTranscript.from_device_state(res2.state)
        htf.absorb_many(g2_vals)
        res2 = res2._replace(state=htf.device_state())
        # MPC hiding open: combine the party proof shares, then re-randomize
        # the COMBINED proof — the witness never exists in one place
        w_eval, base_proof = _open_shares(srs, w_shares, ry)
        w_hiding = ZK.hide_proof(srs, zk_params, base_proof, ry_ints,
                                 w_blinder, zk_rng)
        w_proof = None
        zk_data = ZkData(
            g1_comms=g1_comms, g1_sum=g1_sum, g1_vals=g1_vals,
            g1_proofs=g1_proofs, g2_comms=g2_comms, g2_sum=g2_sum,
            g2_vals=g2_vals, g2_proofs=g2_proofs, w_hiding=w_hiding,
        )
    else:
        w_eval, w_proof = ck.phase(
            "opening", lambda: _open_shares(srs, w_shares, ry))

    # succinct round 4 (Spark-logup over the committed index) runs on PUBLIC
    # data, so the MPC path reuses the single-party DFS prover verbatim —
    # exactly the reference's distributed public fourth round
    # (co-spartan/src/worker.rs:399-574, coordinator.rs:474-589)
    if dfs is not None:
        from . import spartan_dfs

        ht4 = T.HostTranscript.from_device_state(res2.state)
        ht4.absorb(w_eval)
        ht4.absorb(val_m)
        dfs_proof = spartan_dfs.prove_round4(
            dfs, srs, ht4, rx, ry, rabc, res2.challenges
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


def _comb2_shared(polys):
    m_rx, z = polys
    return F.mul(FR, m_rx, z)
