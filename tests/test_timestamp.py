"""Timestamp range check (timestamp_range_check.rs parity).

Covers: honest read_ts traces verify; causality violations are rejected at
witness build; a tampered proof (column value pushed out of range after
witness build) fails verification; the closed-form identity MLE matches
the generic init-image fold.
"""

import random

import pytest

from co_zkvms_tpu.models.jolt import timestamp as TS
from co_zkvms_tpu.models.jolt import rw_memory as RW
from co_zkvms_tpu.ops import pst13
from co_zkvms_tpu.ops.field import FR


@pytest.fixture(scope="module")
def srs():
    return pst13.setup_cached(6, seed=11)


def _honest_read_ts(n, seed=0):
    rng = random.Random(seed)
    return [rng.randint(0, j) for j in range(n)]


def test_timestamp_range_check_roundtrip(srs):
    read_ts = _honest_read_ts(12, seed=3)
    proof, instances = TS.prove(read_ts, srs)
    assert TS.verify(proof, instances, srs)


def test_causality_violation_rejected():
    with pytest.raises(ValueError):
        TS.timestamp_columns([0, 2, 1])  # read_ts[1] = 2 > 1


def test_out_of_range_column_fails(srs):
    # a column containing a value >= 2^t_bits cannot produce a verifying
    # proof: its lookup address has no init/final partner
    t_bits = 4
    vals = [1, 2, 3, (1 << t_bits) + 1]
    traces = TS.range_check_traces({"bad": vals}, t_bits)
    with pytest.raises(AssertionError):
        # build_witness replays against the identity image and the
        # out-of-range address immediately desyncs
        RW.build_witness(traces[0])


def test_wrong_init_image_rejected(srs):
    read_ts = _honest_read_ts(8, seed=5)
    proof, instances = TS.prove(read_ts, srs)
    # claim a non-identity table: verify must refuse even if the memory
    # proof itself is internally consistent
    nm, mb, init = instances[0]
    forged = [(nm, mb, [0] * (1 << mb))] + instances[1:]
    assert not TS.verify(proof, forged, srs)


def test_identity_eval_closed_form():
    rng = random.Random(9)
    mem_bits = 5
    rho = [rng.randrange(FR.modulus) for _ in range(mem_bits)]
    generic = 0
    eq = RW._eq_table_ints(rho)
    for a in range(1 << mem_bits):
        generic = (generic + a * eq[a]) % FR.modulus
    assert TS.identity_eval(rho, mem_bits) == generic
