"""Batched opening reduction: many points -> one PST13 opening."""

import pytest

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import opening_accumulator as OA
from co_zkvms_tpu.ops import pst13
from co_zkvms_tpu.ops import transcript as T
from tests.test_poly import mle_eval_ints

MOD = F.FR.modulus


@pytest.fixture(scope="module")
def srs():
    return pst13.setup_cached(4, seed=1)


def test_reduce_and_verify(rng, srs):
    nv, k = 4, 3
    tables_ints = [[rng.randrange(MOD) for _ in range(1 << nv)] for _ in range(k)]
    points_ints = [[rng.randrange(MOD) for _ in range(nv)] for _ in range(k)]
    values = [mle_eval_ints(t, p) for t, p in zip(tables_ints, points_ints)]

    tables = [F.from_int(F.FR, t) for t in tables_ints]
    comms = [pst13.commit(srs, t) for t in tables]
    claims_p = [
        (t, F.from_int(F.FR, p), v)
        for t, p, v in zip(tables, points_ints, values)
    ]
    ht = T.HostTranscript(OA.LABEL)
    proof = OA.reduce_and_prove(ht, claims_p, srs)

    claims_v = list(zip(points_ints, values))
    ht2 = T.HostTranscript(OA.LABEL)
    assert OA.verify(ht2, claims_v, comms, proof, srs)

    # wrong claimed value rejected
    bad = [(points_ints[0], (values[0] + 1) % MOD)] + claims_v[1:]
    assert not OA.verify(T.HostTranscript(OA.LABEL), bad, comms, proof, srs)

    # tampered z-eval rejected
    bad_proof = proof._replace(
        z_evals=[(proof.z_evals[0] + 1) % MOD] + proof.z_evals[1:]
    )
    assert not OA.verify(T.HostTranscript(OA.LABEL), claims_v, comms,
                         bad_proof, srs)
