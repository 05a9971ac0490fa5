"""co-Spartan MPC prover: same proof as single-party, incl. mesh-sharded run."""

import jax
import numpy as np
import pytest

from co_zkvms_tpu.models import co_spartan, spartan
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
    srs = pst13.setup_cached(3, seed=2)
    return index, srs, z


def test_co_spartan_matches_single_party(setup):
    index, srs, z = setup
    single = spartan.prove(index, srs, z)
    mpc_proof = co_spartan.prove_rep3(index, srs, z)
    # bit-identical proofs: masks cancel in every opened value
    assert mpc_proof == single
    assert spartan.verify(index, srs, [35], mpc_proof)


def test_co_spartan_mesh_sharded(setup):
    """Party axis on a 3-wide mesh axis, hypercube on the chunk axis."""
    index, srs, z = setup
    devs = jax.devices()[:6]
    mesh = jax.sharding.Mesh(np.array(devs).reshape(3, 2), ("party", "chunk"))
    sharded = co_spartan.prove_rep3(index, srs, z, mesh=mesh)
    local = co_spartan.prove_rep3(index, srs, z)
    assert sharded == local  # sharding is placement only — same proof
    assert spartan.verify(index, srs, [35], sharded)


def test_co_spartan_different_share_keys_same_proof(setup):
    index, srs, z = setup
    p1 = co_spartan.prove_rep3(
        index, srs, z, share_key=jax.random.key(42), mask_key=jax.random.key(43)
    )
    p2 = co_spartan.prove_rep3(
        index, srs, z, share_key=jax.random.key(99), mask_key=jax.random.key(100)
    )
    assert p1 == p2  # resharing/masking randomness never reaches the proof


def test_co_spartan_succinct_round4():
    """MPC proof carries the DFS round: verify never touches the matrices
    (worker.rs:399-574 parity — round 4 is public data)."""
    from co_zkvms_tpu.models import spartan_dfs

    b = cubic_circuit()
    r1cs = b.build()
    z = [1, 35, 3, 9, 27]
    index = spartan.SpartanIndex.from_r1cs(r1cs)
    srs = pst13.setup_cached(max(index.nv + 1, 4), seed=3)
    dfs = spartan_dfs.build_index(r1cs, srs)

    single = spartan.prove(index, srs, z, dfs=dfs)
    mpc_proof = co_spartan.prove_rep3(index, srs, z, dfs=dfs)
    assert mpc_proof == single
    assert mpc_proof.dfs is not None
    assert spartan.verify(index, srs, [35], mpc_proof, dfs_vk=dfs.vk)


def test_co_spartan_zk_matches_single_party(setup):
    """MPC + ZK: the coordinator-side zk machinery (hiding commitment over
    the COMBINED share commitment, closed-form mask injection after the
    party-sum opening, re-randomized combined opening proof) yields a proof
    bit-identical to the single-party zk proof for the same zk rng stream —
    and no step materializes the witness."""
    import random

    from co_zkvms_tpu.ops import zk as ZK

    index, srs, z = setup
    params = ZK.from_seed(srs.nv, seed=2, max_deg=4)

    single = spartan.prove(index, srs, z, zk_ctx=(params, random.Random(5)))
    mpc_proof = co_spartan.prove_rep3(
        index, srs, z, zk_ctx=(params, random.Random(5)))
    assert mpc_proof == single
    assert spartan.verify(index, srs, [35], mpc_proof, zk_params=params)
    # different share/mask keys still yield the same (zk) proof: MPC
    # randomness cancels, zk randomness comes only from the zk rng stream
    mpc2 = co_spartan.prove_rep3(
        index, srs, z, share_key=jax.random.key(81),
        mask_key=jax.random.key(82), zk_ctx=(params, random.Random(5)))
    assert mpc2 == mpc_proof
    # and a different zk stream re-randomizes the proof (hiding)
    mpc3 = co_spartan.prove_rep3(
        index, srs, z, zk_ctx=(params, random.Random(6)))
    assert mpc3.w_commitment != mpc_proof.w_commitment
    assert spartan.verify(index, srs, [35], mpc3, zk_params=params)
