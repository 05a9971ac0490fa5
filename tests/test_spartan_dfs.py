"""Succinct DFS Spartan: logup-based val_m check end-to-end."""

import pytest

from co_zkvms_tpu.models import spartan, spartan_dfs
from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import pst13
from tests.test_spartan import cubic_circuit

MOD = F.FR.modulus


@pytest.fixture(scope="module")
def setup():
    b = cubic_circuit()
    r1cs = b.build()
    z = [1, 35, 3, 9, 27]
    index = spartan.SpartanIndex.from_r1cs(r1cs)
    srs = pst13.setup_cached(max(index.nv + 1, 4), seed=3)
    dfs = spartan_dfs.build_index(r1cs, srs)
    return index, srs, z, dfs


def test_dfs_spartan_e2e(setup):
    index, srs, z, dfs = setup
    proof = spartan.prove(index, srs, z, dfs=dfs)
    assert proof.dfs is not None
    assert spartan.verify(index, srs, [35], proof, dfs_vk=dfs.vk)

    # tampering with the claimed val_m breaks the logup round
    bad = proof._replace(val_m=(proof.val_m + 1) % MOD)
    assert not spartan.verify(index, srs, [35], bad, dfs_vk=dfs.vk)

    # tampering with an opened oracle value fails the batch opening
    evs = dict(proof.dfs.evals)
    evs["val_a"] = (evs["val_a"] + 1) % MOD
    bad2 = proof._replace(dfs=proof.dfs._replace(evals=evs))
    assert not spartan.verify(index, srs, [35], bad2, dfs_vk=dfs.vk)

    # wrong public input still rejected
    assert not spartan.verify(index, srs, [36], proof, dfs_vk=dfs.vk)
