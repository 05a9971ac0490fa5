"""PST13 multilinear polynomial commitments (BN254, MSM on TPU).

Re-implements the capability of arkworks ``MultilinearPC`` as used by the
reference (co-jolt/src/poly/commitment/pst13.rs, co-spartan's distributed
commit/open — SURVEY.md §2.6): commit = one MSM of the evaluation table
against Lagrange-basis SRS points; open at r = the quotient ladder

    f(x) - f(r) = sum_k (x_k - r_k) * q_k(x_{k+1..}),
    q_k = t_k(1, rest) - t_k(0, rest),   t_{k+1} = bind_low(t_k, r_k)

with one shrinking MSM per level (worker.rs:774-809 is the reference's MSM
hot loop). Verification is the pairing product check

    e(C - v*G, H) = prod_k e(pi_k, H^{tau_k - r_k})

evaluated host-side with the pure-Python pairing (verifier cost is nv+1
pairings — not a prover-path concern).

Variable order matches ops/poly.py (bind x_0 = LSB first). Commitments and
proofs cross the host boundary as plain (x, y) int pairs.
"""

from __future__ import annotations

import os
import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as C
from . import field as F
from . import msm as M
from . import poly as P
from . import ref_bn254 as bn
from .curve import APoint
from .field import FR, FQ


class SRS(NamedTuple):
    nv: int
    ck_levels: tuple          # APoint batches; level k has 2^(nv-k) points
    h_taus: tuple             # python G2 points h^{tau_k}, k = 0..nv-1

    def level(self, k: int) -> APoint:
        return self.ck_levels[k]


class Commitment(NamedTuple):
    xy: tuple                 # (x, y) ints; (0, 0) = infinity

    def point(self):
        return bn.g1_from_coords(self.xy)


class OpeningProof(NamedTuple):
    pis: tuple                # nv (x, y) int pairs


def setup(nv: int, seed: int = 0) -> SRS:
    """Generate an SRS for nv variables (deterministic from ``seed``).

    Trusted-setup trapdoor: tau derived from seed — test/bench setup only,
    like the reference's ``setup_rep3`` seeded SRS (co-spartan/src/setup.rs).
    """
    import hashlib

    taus = []
    for k in range(nv):
        d = hashlib.sha256(f"co_zkvms_tpu/pst13/{seed}/{k}".encode()).digest()
        taus.append(int.from_bytes(d, "little") % FR.modulus)

    g_aff = C.APoint(*[a[0] for a in C.points_from_ints([bn.g1_coords(bn.G1_GEN)])])
    levels = []
    for k in range(nv + 1):
        if k < nv:
            eq_tab = P.eq_table(FR, F.from_int(FR, taus[k:]))  # [2^(nv-k), 16]
        else:
            eq_tab = F.ones_mont(FR, (1,))
        pts = M.fixed_base_msm(g_aff, eq_tab)
        levels.append(C.to_affine(pts))
    h_taus = tuple(bn.scalar_mul(bn.G2_GEN, t) for t in taus)
    return SRS(nv=nv, ck_levels=tuple(levels), h_taus=h_taus)


_SRS_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".srs_cache")


def setup_cached(nv: int, seed: int = 0) -> SRS:
    """Disk-cached setup (SRS generation is offline; see BASELINE.md)."""
    os.makedirs(_SRS_CACHE_DIR, exist_ok=True)
    path = os.path.join(_SRS_CACHE_DIR, f"srs_{nv}_{seed}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            raw = pickle.load(f)
        levels = tuple(
            APoint(jnp.asarray(x), jnp.asarray(y)) for x, y in raw["levels"]
        )
        h_taus = tuple(
            (bn.FQ2(ht[0]), bn.FQ2(ht[1])) if ht is not None else None
            for ht in raw["h_taus"]
        )
        return SRS(nv=raw["nv"], ck_levels=levels, h_taus=h_taus)
    srs = setup(nv, seed)
    raw = {
        "nv": srs.nv,
        "levels": [(np.asarray(l.x), np.asarray(l.y)) for l in srs.ck_levels],
        "h_taus": [
            (tuple(ht[0].coeffs), tuple(ht[1].coeffs)) for ht in srs.h_taus
        ],
    }
    with open(path, "wb") as f:
        pickle.dump(raw, f)
    return srs


def _msm_to_coords(points: APoint, scalars) -> tuple:
    res = C.to_affine(M.msm(points, scalars))
    return C.points_to_ints(res)[0]


def commit(srs: SRS, evals) -> Commitment:
    """Commit to an MLE table [2^nv', 16] with nv' <= srs.nv.

    Tables smaller than the SRS use the TOP level of matching size — i.e.
    level (srs.nv - nv'), whose points are g^{eq(tau_{nv-nv':}, i)}.
    """
    n = evals.shape[0]
    nv = n.bit_length() - 1
    lvl = srs.nv - nv
    return Commitment(xy=_msm_to_coords(srs.level(lvl), evals))


def commit_batch(srs: SRS, tables) -> list:
    """Commit many MLE tables with two blocking host fetch rounds TOTAL
    (msm_batch_ints) instead of ~3 round-trips per commit. Same group
    elements as per-table commit(); maps the reference's batched commit
    sweep (co-jolt jolt/vm/jolt/mod.rs commit phase, rayon over polys)."""
    jobs = []
    for t in tables:
        nv = t.shape[0].bit_length() - 1
        jobs.append((srs.level(srs.nv - nv), t))
    return [Commitment(xy=xy) for xy in M.msm_batch_ints(jobs)]


def open_at(srs: SRS, evals, point_mont) -> tuple:
    """Open the MLE at ``point_mont`` [nv', 16]. Returns (value_int, proof).

    The per-level quotient q_k depends only on the bound table, never on a
    prior level's MSM — so all nv quotient MSMs dispatch first and finish
    through ONE msm_batch_ints round instead of nv sequential host waits.
    """
    n = evals.shape[0]
    nv = n.bit_length() - 1
    base = srs.nv - nv
    t = evals
    jobs = []
    for k in range(nv):
        even = t[0::2]
        odd = t[1::2]
        q = F.sub(FR, odd, even)
        jobs.append((srs.level(base + k + 1), q))
        t = P.bind_low(FR, t, point_mont[k])
    pis = M.msm_batch_ints(jobs)
    value = int(F.to_int(FR, t[0]))
    return value, OpeningProof(pis=tuple(pis))


def verify(
    srs: SRS, comm: Commitment, point_ints, value: int, proof: OpeningProof
) -> bool:
    """Pairing product check (host). ``point_ints``: list of nv' ints."""
    nv = len(point_ints)
    base = srs.nv - nv
    c_pt = comm.point()
    g = bn.G1_GEN
    lhs = bn.add(c_pt, bn.neg_pt(bn.scalar_mul(g, value)))  # C - vG
    pairs = [(bn.neg_pt(lhs), bn.G2_GEN)] if lhs is not None else []
    for k in range(nv):
        pi = bn.g1_from_coords(proof.pis[k])
        if pi is None:
            continue
        h_exp = bn.add(
            srs.h_taus[base + k],
            bn.neg_pt(bn.scalar_mul(bn.G2_GEN, point_ints[k])),
        )  # h^(tau_k - r_k)
        if h_exp is None:
            continue
        pairs.append((pi, h_exp))
    return bn.multi_pairing_is_one(pairs)


# --- batched opening (eta-RLC aggregation; snarks-core poly/commitment.rs) --


def aggregate_evals_ints(eta: int, vals) -> int:
    acc = 0
    for i, v in enumerate(reversed(list(vals))):
        acc = (acc * eta + v) % FR.modulus
    return acc


def aggregate_comms(eta: int, comms) -> Commitment:
    acc = None
    for i, cm in enumerate(comms):
        acc = bn.add(acc, bn.scalar_mul(cm.point(), pow(eta, i, FR.modulus)))
    return Commitment(xy=bn.g1_coords(acc))


def batch_open(srs: SRS, tables, eta_mont, point_mont):
    """Open sum_i eta^i * table_i at one point with a single proof."""
    k = len(tables)
    etas = [F.ones_mont(FR)]
    for _ in range(k - 1):
        etas.append(F.mul(FR, etas[-1], eta_mont))
    coeffs = jnp.stack(etas)
    stacked = jnp.stack(tables)
    agg = P.linear_combination(FR, coeffs, stacked)
    return open_at(srs, agg, point_mont)


def batch_verify(
    srs: SRS, comms, evals_ints, eta: int, point_ints, value: int, proof
) -> bool:
    if value != aggregate_evals_ints(eta, evals_ints):
        return False
    return verify(srs, aggregate_comms(eta, comms), point_ints, value, proof)
