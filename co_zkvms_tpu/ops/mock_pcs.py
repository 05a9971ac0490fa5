"""Mock commitment scheme: pst13-compatible surface without MSMs/pairings.

Maps co-jolt's MockCommitScheme (poly/commitment/mock.rs, 219 LoC): protocol
logic can be exercised — and CI kept fast — with commitments that are just
table digests and openings that are re-evaluations. Like the reference's
mock (which keeps the polynomial inside the commitment), this is generically
UNSOUND and for tests only.

Surface parity with ops/pst13.py: setup/commit/open_at/verify/batch_open/
batch_verify plus the aggregate helpers, so model code written against the
module interface (jolt/lasso/spartan ``pcs=`` parameter) runs unchanged.
The "commitment coordinates" are the table digest split into two 128-bit
ints, so transcript absorption works exactly like a curve point's (x, y).
"""

from __future__ import annotations

import hashlib
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from . import poly as P
from .field import FR


class SRS(NamedTuple):
    nv: int


class Commitment(NamedTuple):
    xy: tuple                   # (lo, hi) digest ints — transcript-absorbable
    table: object = None        # the committed table (mock keeps it, like
                                # mock.rs) — excluded from equality on xy

    def point(self):
        raise TypeError("mock commitments have no curve point")


class OpeningProof(NamedTuple):
    pis: tuple                  # () — mock proofs are empty


def setup(nv: int, seed: int = 0) -> SRS:
    return SRS(nv=nv)


def setup_cached(nv: int, seed: int = 0) -> SRS:
    return SRS(nv=nv)


def _digest(evals) -> tuple:
    host = np.asarray(jax.device_get(evals), dtype=np.uint32)
    d = hashlib.sha256(host.tobytes()).digest()
    return (int.from_bytes(d[:16], "little"), int.from_bytes(d[16:], "little"))


def commit(srs: SRS, evals) -> Commitment:
    return Commitment(xy=_digest(evals), table=evals)


def open_at(srs: SRS, evals, point_mont) -> tuple:
    value = int(F.to_int(FR, P.evaluate(FR, evals, point_mont)))
    return value, OpeningProof(pis=())


def verify(srs: SRS, comm: Commitment, point_ints, value: int,
           proof: OpeningProof) -> bool:
    if comm.table is None:
        return False
    point = F.from_int(FR, [v % FR.modulus for v in point_ints])
    got = int(F.to_int(FR, P.evaluate(FR, comm.table, point)))
    return got == value and comm.xy == _digest(comm.table)


def aggregate_evals_ints(eta: int, vals) -> int:
    acc = 0
    for v in reversed(list(vals)):
        acc = (acc * eta + v) % FR.modulus
    return acc


def aggregate_comms(eta: int, comms) -> Commitment:
    tables = [cm.table for cm in comms]
    eta_f = F.from_int(FR, eta % FR.modulus)
    coeffs = [F.ones_mont(FR)]
    for _ in range(len(tables) - 1):
        coeffs.append(F.mul(FR, coeffs[-1], eta_f))
    agg = P.linear_combination(FR, jnp.stack(coeffs), jnp.stack(tables))
    return commit(SRS(nv=0), agg)


def batch_open(srs: SRS, tables, eta_mont, point_mont):
    k = len(tables)
    etas = [F.ones_mont(FR)]
    for _ in range(k - 1):
        etas.append(F.mul(FR, etas[-1], eta_mont))
    agg = P.linear_combination(FR, jnp.stack(etas), jnp.stack(tables))
    return open_at(srs, agg, point_mont)


def batch_verify(srs: SRS, comms, evals_ints, eta: int, point_ints,
                 value: int, proof) -> bool:
    if value != aggregate_evals_ints(eta, evals_ints):
        return False
    return verify(srs, aggregate_comms(eta, comms), point_ints, value, proof)
