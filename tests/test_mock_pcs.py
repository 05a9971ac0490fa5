"""Mock PCS (poly/commitment/mock.rs parity): pst13-surface-compatible,
MSM-free commitments for protocol-logic tests."""

import random

import jax.numpy as jnp

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import mock_pcs as MP
from co_zkvms_tpu.ops.field import FR

MOD = FR.modulus


def _table(rng, nv):
    return F.from_int(FR, [rng.randrange(MOD) for _ in range(1 << nv)])


def test_mock_commit_open_verify():
    rng = random.Random(2)
    srs = MP.setup_cached(4)
    t = _table(rng, 3)
    cm = MP.commit(srs, t)
    point_ints = [rng.randrange(MOD) for _ in range(3)]
    point = F.from_int(FR, point_ints)
    val, proof = MP.open_at(srs, t, point)
    assert MP.verify(srs, cm, point_ints, val, proof)
    assert not MP.verify(srs, cm, point_ints, (val + 1) % MOD, proof)
    # commitment is binding on the digest
    t2 = _table(rng, 3)
    cm_forged = MP.Commitment(xy=cm.xy, table=t2)
    assert not MP.verify(
        srs, cm_forged, point_ints,
        MP.open_at(srs, t2, point)[0], proof)


def test_mock_batch_open_verify():
    rng = random.Random(3)
    srs = MP.setup_cached(4)
    tables = [_table(rng, 3) for _ in range(3)]
    comms = [MP.commit(srs, t) for t in tables]
    eta = rng.randrange(MOD)
    point_ints = [rng.randrange(MOD) for _ in range(3)]
    point = F.from_int(FR, point_ints)
    val, proof = MP.batch_open(srs, tables, F.from_int(FR, eta), point)
    evals = [MP.open_at(srs, t, point)[0] for t in tables]
    assert MP.batch_verify(srs, comms, evals, eta, point_ints, val, proof)
    bad = [(evals[0] + 1) % MOD] + evals[1:]
    assert not MP.batch_verify(srs, comms, bad, eta, point_ints, val, proof)
