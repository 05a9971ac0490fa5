"""Preemption-safe proof checkpointing: crash mid-proof, resume, same proof.

The reference has no mid-proof recovery (SURVEY.md §5); this covers the
TPU-native requirement that long proofs survive preemption
(utils/checkpoint.py + spartan.prove(ckpt=...))."""

import pytest

from co_zkvms_tpu.models import spartan
from co_zkvms_tpu.models.r1cs import R1CSBuilder
from co_zkvms_tpu.ops import pst13
from co_zkvms_tpu.utils import checkpoint as CK


def cubic_circuit():
    b = R1CSBuilder(num_public=2)
    x = b.new_wire()
    w1 = b.new_wire()
    w2 = b.new_wire()
    b.add_constraint([(1, x)], [(1, x)], [(1, w1)])
    b.add_constraint([(1, w1)], [(1, x)], [(1, w2)])
    b.add_constraint([(1, w2), (1, x), (5, 0)], [(1, 0)], [(1, 1)])
    return b


@pytest.fixture(scope="module")
def srs():
    return pst13.setup_cached(4, seed=7)


class _Preempted(RuntimeError):
    pass


class _CrashingCheckpointer(CK.Checkpointer):
    """Raises (simulated preemption) after ``survive`` computed phases."""

    def __init__(self, directory, digest, registry, survive):
        super().__init__(directory, digest, registry=registry)
        self.survive = survive

    def phase(self, name, fn):
        if self.computed >= self.survive:
            raise _Preempted(name)
        return super().phase(name, fn)


def test_resume_after_preemption(tmp_path, srs):
    index = spartan.SpartanIndex.from_r1cs(cubic_circuit().build())
    z = [1, 35, 3, 9, 27]
    baseline = spartan.prove(index, srs, z)

    reg = spartan._ckpt_registry()
    digest = "t1"
    # crash after each possible number of completed phases
    for survive in (1, 2):
        crash = _CrashingCheckpointer(str(tmp_path), digest, reg, survive)
        with pytest.raises(_Preempted):
            spartan.prove(index, srs, z, ckpt=crash)
        assert crash.computed == survive

    resumed = CK.Checkpointer(str(tmp_path), digest, registry=reg)
    proof = spartan.prove(index, srs, z, ckpt=resumed)
    # journal after the two crashes: commit (run 1) + sumcheck1/2 (run 2)
    assert resumed.loaded == 3
    assert proof == baseline            # deterministic resume, same proof
    assert spartan.verify(index, srs, [35], proof)

    # a second full run loads every phase
    again = CK.Checkpointer(str(tmp_path), digest, registry=reg)
    proof2 = spartan.prove(index, srs, z, ckpt=again)
    assert again.computed == 0 and proof2 == baseline


def test_digest_separates_statements(tmp_path, srs):
    index = spartan.SpartanIndex.from_r1cs(cubic_circuit().build())
    p35 = spartan.prove(index, srs, [1, 35, 3, 9, 27], ckpt=str(tmp_path))
    # different witness -> different journal -> fresh (and correct) proof
    p73 = spartan.prove(index, srs, [1, 73, 4, 16, 64], ckpt=str(tmp_path))
    assert p35 != p73
    assert spartan.verify(index, srs, [35], p35)
    assert spartan.verify(index, srs, [73], p73)


def test_array_roundtrip(tmp_path):
    import jax.numpy as jnp

    ck = CK.Checkpointer(str(tmp_path), "arrays")
    payload = {"a": jnp.arange(12, dtype=jnp.uint32).reshape(3, 4),
               "n": 1 << 300, "b": b"\x00\xff", "t": (1, [2, 3], None)}
    out = ck.phase("p", lambda: payload)
    ck2 = CK.Checkpointer(str(tmp_path), "arrays")
    loaded = ck2.phase("p", lambda: pytest.fail("must load from journal"))
    assert ck2.loaded == 1
    assert (loaded["a"] == out["a"]).all()
    assert loaded["n"] == payload["n"] and loaded["b"] == payload["b"]
    assert loaded["t"] == (1, [2, 3], None)
