"""PST13 commit/open/verify, including batched opening and sub-size tables."""

import pytest

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import poly as P
from co_zkvms_tpu.ops import pst13

FR = F.FR
MOD = FR.modulus


@pytest.fixture(scope="module")
def srs():
    return pst13.setup_cached(4, seed=1)


def test_commit_open_verify(rng, srs):
    nv = 4
    table_ints = [rng.randrange(MOD) for _ in range(1 << nv)]
    point_ints = [rng.randrange(MOD) for _ in range(nv)]
    table = F.from_int(FR, table_ints)
    point = F.from_int(FR, point_ints)

    comm = pst13.commit(srs, table)
    value, proof = pst13.open_at(srs, table, point)

    import tests.test_poly as tp

    assert value == tp.mle_eval_ints(table_ints, point_ints)
    assert pst13.verify(srs, comm, point_ints, value, proof)
    # tampered value must fail
    assert not pst13.verify(srs, comm, point_ints, (value + 1) % MOD, proof)
    # tampered point must fail
    bad_pt = list(point_ints)
    bad_pt[0] = (bad_pt[0] + 1) % MOD
    assert not pst13.verify(srs, comm, bad_pt, value, proof)


def test_subsize_table(rng, srs):
    nv = 2
    table_ints = [rng.randrange(MOD) for _ in range(1 << nv)]
    point_ints = [rng.randrange(MOD) for _ in range(nv)]
    table = F.from_int(FR, table_ints)
    comm = pst13.commit(srs, table)
    value, proof = pst13.open_at(srs, table, F.from_int(FR, point_ints))
    import tests.test_poly as tp

    assert value == tp.mle_eval_ints(table_ints, point_ints)
    assert pst13.verify(srs, comm, point_ints, value, proof)


def test_batch_open_verify(rng, srs):
    nv = 4
    k = 3
    tables_ints = [[rng.randrange(MOD) for _ in range(1 << nv)] for _ in range(k)]
    point_ints = [rng.randrange(MOD) for _ in range(nv)]
    eta = rng.randrange(MOD)

    tables = [F.from_int(FR, t) for t in tables_ints]
    comms = [pst13.commit(srs, t) for t in tables]
    value, proof = pst13.batch_open(
        srs, tables, F.from_int(FR, eta), F.from_int(FR, point_ints)
    )
    import tests.test_poly as tp

    evals = [tp.mle_eval_ints(t, point_ints) for t in tables_ints]
    assert pst13.batch_verify(srs, comms, evals, eta, point_ints, value, proof)
    bad = list(evals)
    bad[1] = (bad[1] + 1) % MOD
    assert not pst13.batch_verify(srs, comms, bad, eta, point_ints, value, proof)


def test_commitment_is_homomorphic(rng, srs):
    """commit(a) + commit(b) == commit(a+b) — the distributed-merge algebra

    (snarks-core/src/poly/commitment.rs combine_comm): worker chunk
    commitments sum to the full commitment.
    """
    from co_zkvms_tpu.ops import ref_bn254 as bn

    nv = 4
    a = [rng.randrange(MOD) for _ in range(1 << nv)]
    b = [rng.randrange(MOD) for _ in range(1 << nv)]
    ca = pst13.commit(srs, F.from_int(FR, a)).point()
    cb = pst13.commit(srs, F.from_int(FR, b)).point()
    cab = pst13.commit(
        srs, F.from_int(FR, [(x + y) % MOD for x, y in zip(a, b)])
    ).point()
    assert bn.add(ca, cb) == cab
