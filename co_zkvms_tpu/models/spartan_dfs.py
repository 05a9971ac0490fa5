"""Succinct DFS round: Spark-style sparse-matrix evaluation via logup.

Replaces the lite verifier's O(nnz) recomputation of M(r_x, r_y) with the
reference's round-4 argument (spartan/src/logup.rs, indexer.rs freq polys,
co-spartan fourth_round — SURVEY.md §2.5/2.6): the indexer commits the
sparse structure once, and each proof shows

  (1) value:     val_m = sum_k valmix(k) * e_rx(k) * e_ry(k)
  (2) row logup: pairs (row_k, e_rx_k) lie in the table (i, eq(r_x, i))
  (3) col logup: pairs (col_k, e_ry_k) lie in the table (i, eq(r_y, i))

where e_rx(k) = eq(r_x, row_k) is a committed prover polynomial. Pairs are
gamma-combined; LogUp identity sum m/(x+t) = sum 1/(x+q) is enforced with
h0 = m/(x+t), h1 = 1/(x+q) and per-point zerochecks, all batched with a
lambda-RLC into ONE degree-3 sumcheck over the entries domain (the
reference's "batch open 15 oracles" round). Table-side polynomials live on
the (smaller) matrix domain and enter the sumcheck tiled; their MLEs ignore
the high variables, so they open at the point prefix p_lo.

Everything here is public data — the co-Spartan MPC prover reuses it
verbatim (the reference's round 4 likewise runs on public data,
worker.rs:399-574).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..ops import field as F
from ..ops import poly as P
from ..ops import pst13
from ..ops import sumcheck as SC
from ..ops import transcript as T
from ..ops.field import FR
from .r1cs import R1CS

MOD = FR.modulus


class DFSIndex(NamedTuple):
    """Prover-side index: device tables + commitments of the sparse structure."""

    nv: int                     # matrix domain (rows/cols) log-size
    dlog: int                   # entries domain log-size (>= nv not required)
    dd: int                     # dlog - nv when dlog > nv else 0
    rows: jnp.ndarray           # int32 [K]
    cols: jnp.ndarray           # int32 [K]
    vals: tuple                 # (val_a, val_b, val_c) each [K, 16]
    row_mle: jnp.ndarray        # [K, 16] row indices as field elements
    col_mle: jnp.ndarray
    freq_r: jnp.ndarray         # [2^nv, 16] lookup multiplicities
    freq_c: jnp.ndarray
    idx_mle: jnp.ndarray        # [2^nv, 16] identity MLE table
    comms: dict                 # name -> pst13.Commitment

    @property
    def vk(self) -> "DFSVerifierKey":
        return DFSVerifierKey(nv=self.nv, dlog=self.dlog, dd=self.dd,
                              comms=self.comms)


class DFSVerifierKey(NamedTuple):
    nv: int
    dlog: int
    dd: int
    comms: dict


class DFSRoundProof(NamedTuple):
    e_rx_comm: tuple
    e_ry_comm: tuple
    h_comms: dict               # h0r, h1r, h0c, h1c -> (x, y)
    sumcheck_msgs: list         # [dlog][4] ints (degree 3)
    evals: dict                 # 13 opened values (ints)
    batch_proof_k: pst13.OpeningProof     # entries-domain group at p
    batch_proof_nv: pst13.OpeningProof    # matrix-domain group at p_lo


GROUP_K = ["e_rx", "e_ry", "val_a", "val_b", "val_c", "h1r", "h1c", "row", "col"]
GROUP_NV = ["h0r", "h0c", "freq_r", "freq_c"]


def build_index(r1cs: R1CS, srs: pst13.SRS) -> DFSIndex:
    """Offline indexer (maps spartan/src/indexer.rs index_for_prover_and_verifier)."""
    nv = r1cs.nv
    n = 1 << nv
    entries = {}
    for mat, slot in ((r1cs.a, 0), (r1cs.b, 1), (r1cs.c, 2)):
        for r, c, v in zip(mat.rows, mat.cols, mat.vals):
            entries.setdefault((int(r), int(c)), [0, 0, 0])[slot] = int(v) % MOD
    keys = sorted(entries.keys())
    nnz = max(len(keys), 1)
    # entries domain >= matrix domain so table-side boosting (dd>0) only
    # happens for denser-than-square instances; padding entries are real
    # (0,0,val=0) lookups and are counted in the freq polynomials.
    dlog = max((nnz - 1).bit_length(), nv, 1)
    k = 1 << dlog
    rows = np.zeros(k, np.int32)
    cols = np.zeros(k, np.int32)
    vals = [np.zeros(k, object) for _ in range(3)]
    for i, (r, c) in enumerate(keys):
        rows[i] = r
        cols[i] = c
        for s in range(3):
            vals[s][i] = entries[(r, c)][s]
    freq_r = np.bincount(rows, minlength=n)
    freq_c = np.bincount(cols, minlength=n)

    d_rows = jnp.asarray(rows)
    d_cols = jnp.asarray(cols)
    d_vals = tuple(F.from_int(FR, [int(v) for v in vv]) for vv in vals)
    row_mle = F.from_int(FR, [int(v) for v in rows])
    col_mle = F.from_int(FR, [int(v) for v in cols])
    d_freq_r = F.from_int(FR, [int(v) for v in freq_r])
    d_freq_c = F.from_int(FR, [int(v) for v in freq_c])
    idx_mle = F.from_int(FR, list(range(n)))

    comms = dict(zip(
        ("row", "col", "val_a", "val_b", "val_c", "freq_r", "freq_c"),
        pst13.commit_batch(srs, [row_mle, col_mle, d_vals[0], d_vals[1],
                                 d_vals[2], d_freq_r, d_freq_c])))
    return DFSIndex(
        nv=nv, dlog=dlog, dd=dlog - nv,
        rows=d_rows, cols=d_cols, vals=d_vals,
        row_mle=row_mle, col_mle=col_mle,
        freq_r=d_freq_r, freq_c=d_freq_c, idx_mle=idx_mle, comms=comms,
    )


def _tile(table, dd: int):
    """Tile an nv-domain table 2^dd times (its MLE ignores the top dd vars)."""
    if dd == 0:
        return table
    return jnp.tile(table, (1 << dd, 1))


def _pad_entries(index: DFSIndex, arr):
    """K-domain arrays are already full-size (build_index pads to 2^dlog)."""
    assert arr.shape[0] == 1 << index.dlog
    return arr


def _comb_dfs(polys, consts):
    (e_rx, e_ry, valmix, h0r, h1r, freqr, tr, qr, eqz1,
     h0c, h1c, freqc, tc, qc, eqz2) = polys
    lam, x_r, x_c, sf, one = consts

    def term(i):
        return lam[i]

    g = F.mul(FR, term(0), F.mul(FR, e_rx, F.mul(FR, e_ry, valmix)))
    g = F.add(FR, g, F.mul(FR, term(1),
                           F.sub(FR, F.mul(FR, sf, h0r), h1r)))
    z1r = F.sub(FR, F.mul(FR, h0r, F.add(FR, x_r, tr)), freqr)
    g = F.add(FR, g, F.mul(FR, term(2), F.mul(FR, eqz1, z1r)))
    z1q = F.sub(FR, F.mul(FR, h1r, F.add(FR, x_r, qr)), one)
    g = F.add(FR, g, F.mul(FR, term(3), F.mul(FR, eqz1, z1q)))
    g = F.add(FR, g, F.mul(FR, term(4),
                           F.sub(FR, F.mul(FR, sf, h0c), h1c)))
    z2r = F.sub(FR, F.mul(FR, h0c, F.add(FR, x_c, tc)), freqc)
    g = F.add(FR, g, F.mul(FR, term(5), F.mul(FR, eqz2, z2r)))
    z2q = F.sub(FR, F.mul(FR, h1c, F.add(FR, x_c, qc)), one)
    g = F.add(FR, g, F.mul(FR, term(6), F.mul(FR, eqz2, z2q)))
    return g


def prove_round4(index: DFSIndex, srs: pst13.SRS, ht: T.HostTranscript,
                 rx, ry, rabc, ry_unused=None) -> DFSRoundProof:
    """The succinct val_m round. ``rx``, ``ry``: device [nv, 16] challenges."""
    nv, dd = index.nv, index.dd
    dlog = index.dlog

    eq_rx = P.eq_table(FR, rx)
    eq_ry = P.eq_table(FR, ry)
    rows = _pad_entries(index, index.rows)
    cols = _pad_entries(index, index.cols)
    e_rx = eq_rx[rows]
    e_ry = eq_ry[cols]

    e_rx_comm, e_ry_comm = pst13.commit_batch(srs, [e_rx, e_ry])
    ht.absorb_point(e_rx_comm.xy)
    ht.absorb_point(e_ry_comm.xy)
    g_r, g_c, x_r, x_c = ht.challenges(4)
    dg_r, dg_c = F.from_int(FR, g_r), F.from_int(FR, g_c)
    dx_r, dx_c = F.from_int(FR, x_r), F.from_int(FR, x_c)

    # tables and h polynomials
    table_r = F.add(FR, index.idx_mle, F.mul(FR, dg_r[None], eq_rx))
    table_c = F.add(FR, index.idx_mle, F.mul(FR, dg_c[None], eq_ry))
    row_mle = _pad_entries(index, index.row_mle)
    col_mle = _pad_entries(index, index.col_mle)
    query_r = F.add(FR, row_mle, F.mul(FR, dg_r[None], e_rx))
    query_c = F.add(FR, col_mle, F.mul(FR, dg_c[None], e_ry))

    h0r_small = F.mul(FR, index.freq_r,
                      F.batch_inv(FR, F.add(FR, dx_r[None], table_r)))
    h0c_small = F.mul(FR, index.freq_c,
                      F.batch_inv(FR, F.add(FR, dx_c[None], table_c)))
    h1r = F.batch_inv(FR, F.add(FR, dx_r[None], query_r))
    h1c = F.batch_inv(FR, F.add(FR, dx_c[None], query_c))

    h_comms = dict(zip(
        ("h0r", "h1r", "h0c", "h1c"),
        pst13.commit_batch(srs, [h0r_small, h1r, h0c_small, h1c])))
    for name in ("h0r", "h1r", "h0c", "h1c"):
        ht.absorb_point(h_comms[name].xy)

    z1 = ht.challenges(dlog)
    z2 = ht.challenges(dlog)
    lam = ht.challenge()
    lam_pows = [pow(lam, i + 1, MOD) for i in range(7)]

    # K-domain sumcheck tables
    vals = [_pad_entries(index, v) for v in index.vals]
    dra, drb, drc = rabc[0], rabc[1], rabc[2]
    valmix = F.mul(FR, jnp.broadcast_to(dra, vals[0].shape), vals[0])
    valmix = F.add(FR, valmix, F.mul(FR, jnp.broadcast_to(drb, vals[1].shape), vals[1]))
    valmix = F.add(FR, valmix, F.mul(FR, jnp.broadcast_to(drc, vals[2].shape), vals[2]))
    eq_z1 = P.eq_table(FR, F.from_int(FR, z1))
    eq_z2 = P.eq_table(FR, F.from_int(FR, z2))

    polys = [
        e_rx, e_ry, valmix,
        _tile(h0r_small, dd), h1r, _tile(index.freq_r, dd),
        _tile(table_r, dd), query_r, eq_z1,
        _tile(h0c_small, dd), h1c, _tile(index.freq_c, dd),
        _tile(table_c, dd), query_c, eq_z2,
    ]
    sf = pow(2, dd, MOD)
    sf = pow(sf, -1, MOD)
    consts = (
        F.from_int(FR, lam_pows),
        F.from_int(FR, x_r),
        F.from_int(FR, x_c),
        F.from_int(FR, sf),
        F.ones_mont(FR),
    )

    state = ht.device_state()
    res = SC.prove(FR, state, polys, degree=3, comb=_comb_dfs, consts=consts)
    ht_after = T.HostTranscript.from_device_state(res.state)
    p = res.challenges
    p_lo = p[:nv]

    # openings
    tables_k = {
        "e_rx": e_rx, "e_ry": e_ry,
        "val_a": vals[0], "val_b": vals[1], "val_c": vals[2],
        "h1r": h1r, "h1c": h1c, "row": row_mle, "col": col_mle,
    }
    tables_nv = {
        "h0r": h0r_small, "h0c": h0c_small,
        "freq_r": index.freq_r, "freq_c": index.freq_c,
    }
    evals = {}
    for name, tab in tables_k.items():
        evals[name] = int(F.to_int(FR, P.evaluate(FR, tab, p)))
    for name, tab in tables_nv.items():
        evals[name] = int(F.to_int(FR, P.evaluate(FR, tab, p_lo)))

    for name in GROUP_K + GROUP_NV:
        ht_after.absorb(evals[name])
    eta_k = ht_after.challenge()
    _, proof_k = pst13.batch_open(
        srs, [tables_k[n] for n in GROUP_K], F.from_int(FR, eta_k), p
    )
    eta_nv = ht_after.challenge()
    _, proof_nv = pst13.batch_open(
        srs, [tables_nv[n] for n in GROUP_NV], F.from_int(FR, eta_nv), p_lo
    )
    # sync caller's transcript state
    ht.state = ht_after.state

    return DFSRoundProof(
        e_rx_comm=e_rx_comm.xy,
        e_ry_comm=e_ry_comm.xy,
        h_comms={k: v.xy for k, v in h_comms.items()},
        sumcheck_msgs=[[int(x) for x in row] for row in F.to_int(FR, res.round_msgs)],
        evals=evals,
        batch_proof_k=proof_k,
        batch_proof_nv=proof_nv,
    )


def _eq_eval_ints(r, s):
    acc = 1
    for a, b in zip(r, s):
        acc = acc * (a * b + (1 - a) * (1 - b)) % MOD
    return acc


def verify_round4(vk: DFSVerifierKey, srs: pst13.SRS, ht: T.HostTranscript,
                  proof: DFSRoundProof, rx_ints, ry_ints, rabc_ints,
                  val_m: int) -> bool:
    nv, dd, dlog = vk.nv, vk.dd, vk.dlog
    ra, rb, rc = rabc_ints

    ht.absorb_point(proof.e_rx_comm)
    ht.absorb_point(proof.e_ry_comm)
    g_r, g_c, x_r, x_c = ht.challenges(4)
    for name in ("h0r", "h1r", "h0c", "h1c"):
        ht.absorb_point(proof.h_comms[name])
    z1 = ht.challenges(dlog)
    z2 = ht.challenges(dlog)
    lam = ht.challenge()
    lp = [pow(lam, i + 1, MOD) for i in range(7)]

    claim = lp[0] * val_m % MOD
    try:
        p, expected = SC.verify(proof.sumcheck_msgs, claim, ht)
    except ValueError:
        return False
    p_lo = p[:nv]

    ev = proof.evals
    sf = pow(pow(2, dd, MOD), -1, MOD)
    idx_eval = sum((1 << b) * p_lo[b] for b in range(nv)) % MOD
    eq_rx_p = _eq_eval_ints(rx_ints, p_lo)
    eq_ry_p = _eq_eval_ints(ry_ints, p_lo)
    t_r = (idx_eval + g_r * eq_rx_p) % MOD
    t_c = (idx_eval + g_c * eq_ry_p) % MOD
    q_r = (ev["row"] + g_r * ev["e_rx"]) % MOD
    q_c = (ev["col"] + g_c * ev["e_ry"]) % MOD
    valmix = (ra * ev["val_a"] + rb * ev["val_b"] + rc * ev["val_c"]) % MOD
    eq_z1_p = _eq_eval_ints(z1, p)
    eq_z2_p = _eq_eval_ints(z2, p)

    g = lp[0] * ev["e_rx"] * ev["e_ry"] % MOD * valmix % MOD
    g = (g + lp[1] * (sf * ev["h0r"] - ev["h1r"])) % MOD
    g = (g + lp[2] * eq_z1_p % MOD * (ev["h0r"] * (x_r + t_r) - ev["freq_r"])) % MOD
    g = (g + lp[3] * eq_z1_p % MOD * (ev["h1r"] * (x_r + q_r) - 1)) % MOD
    g = (g + lp[4] * (sf * ev["h0c"] - ev["h1c"])) % MOD
    g = (g + lp[5] * eq_z2_p % MOD * (ev["h0c"] * (x_c + t_c) - ev["freq_c"])) % MOD
    g = (g + lp[6] * eq_z2_p % MOD * (ev["h1c"] * (x_c + q_c) - 1)) % MOD
    if g % MOD != expected:
        return False

    for name in GROUP_K + GROUP_NV:
        ht.absorb(ev[name])

    all_comms = {
        "e_rx": pst13.Commitment(proof.e_rx_comm),
        "e_ry": pst13.Commitment(proof.e_ry_comm),
        "h1r": pst13.Commitment(proof.h_comms["h1r"]),
        "h1c": pst13.Commitment(proof.h_comms["h1c"]),
        "h0r": pst13.Commitment(proof.h_comms["h0r"]),
        "h0c": pst13.Commitment(proof.h_comms["h0c"]),
        **{k: v for k, v in vk.comms.items()},
    }
    eta_k = ht.challenge()
    agg_val_k = pst13.aggregate_evals_ints(eta_k, [ev[n] for n in GROUP_K])
    if not pst13.batch_verify(
        srs, [all_comms[n] for n in GROUP_K], [ev[n] for n in GROUP_K],
        eta_k, p, agg_val_k, proof.batch_proof_k,
    ):
        return False
    eta_nv = ht.challenge()
    agg_val_nv = pst13.aggregate_evals_ints(eta_nv, [ev[n] for n in GROUP_NV])
    return pst13.batch_verify(
        srs, [all_comms[n] for n in GROUP_NV], [ev[n] for n in GROUP_NV],
        eta_nv, p_lo, agg_val_nv, proof.batch_proof_nv,
    )
