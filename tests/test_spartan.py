"""End-to-end Spartan: synthetic R1CS prove + verify (the milestone-8 slice)."""

import pytest

from co_zkvms_tpu.models import spartan
from co_zkvms_tpu.models.r1cs import R1CSBuilder
from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import pst13

MOD = F.FR.modulus


def cubic_circuit():
    """x^3 + x + 5 == y with y public: wires [1, y, x, w1, w2]."""
    b = R1CSBuilder(num_public=2)
    x = b.new_wire()
    w1 = b.new_wire()
    w2 = b.new_wire()
    b.add_constraint([(1, x)], [(1, x)], [(1, w1)])          # x*x = w1
    b.add_constraint([(1, w1)], [(1, x)], [(1, w2)])         # w1*x = w2
    b.add_constraint(
        [(1, w2), (1, x), (5, 0)], [(1, 0)], [(1, 1)]
    )  # (w2 + x + 5) * 1 = y
    return b


def forward_circuit():
    """Solver-friendly: x public, y = x^3 + x + 5 solved as witness."""
    b = R1CSBuilder(num_public=2)  # wires: [1, x]
    w1 = b.new_wire()
    w2 = b.new_wire()
    y = b.new_wire()
    b.add_constraint([(1, 1)], [(1, 1)], [(1, w1)])
    b.add_constraint([(1, w1)], [(1, 1)], [(1, w2)])
    b.add_constraint([(1, w2), (1, 1), (5, 0)], [(1, 0)], [(1, y)])
    return b


def test_witness_solver():
    b = forward_circuit()
    z = b.solve_witness([3])
    assert z == [1, 3, 9, 27, 35]
    r1cs = b.build()
    assert r1cs.check_witness_ints(z)
    bad = list(z)
    bad[-1] = 36
    assert not r1cs.check_witness_ints(bad)


@pytest.fixture(scope="module")
def srs():
    return pst13.setup_cached(3, seed=2)


def test_spartan_e2e(srs):
    b = cubic_circuit()
    r1cs = b.build()
    z = [1, 35, 3, 9, 27]
    assert r1cs.check_witness_ints(z)
    index = spartan.SpartanIndex.from_r1cs(r1cs)
    assert index.nv == 3

    proof = spartan.prove(index, srs, z)
    assert spartan.verify(index, srs, [35], proof)

    # wrong public input rejected
    assert not spartan.verify(index, srs, [36], proof)

    # tampered proof values rejected
    bad = proof._replace(va=(proof.va + 1) % MOD)
    assert not spartan.verify(index, srs, [35], bad)
    bad2 = proof._replace(val_m=(proof.val_m + 1) % MOD)
    assert not spartan.verify(index, srs, [35], bad2)
    bad3 = proof._replace(w_eval=(proof.w_eval + 1) % MOD)
    assert not spartan.verify(index, srs, [35], bad3)


def test_spartan_zk(srs):
    """ZK mode: masked sumchecks + hiding witness commitment; two proofs of
    the same witness are differently randomized, both verify; tampering any
    zk claim is rejected (spartan/src/zk.rs parity)."""
    import random

    from co_zkvms_tpu.ops import zk as ZK

    b = cubic_circuit()
    r1cs = b.build()
    z = [1, 35, 3, 9, 27]
    index = spartan.SpartanIndex.from_r1cs(r1cs)
    params = ZK.from_seed(srs.nv, seed=2, max_deg=4)

    p1 = spartan.prove(index, srs, z, zk_ctx=(params, random.Random(1)))
    p2 = spartan.prove(index, srs, z, zk_ctx=(params, random.Random(2)))
    assert spartan.verify(index, srs, [35], p1, zk_params=params)
    assert spartan.verify(index, srs, [35], p2, zk_params=params)
    # randomization: same witness, different commitments/messages/proofs
    assert p1.w_commitment != p2.w_commitment
    assert p1.sumcheck1_msgs != p2.sumcheck1_msgs
    assert p1.zk.g1_comms != p2.zk.g1_comms

    # a zk proof without params (or vice versa) is rejected
    assert not spartan.verify(index, srs, [35], p1)
    # tampered mask opening rejected
    badzk = p1.zk._replace(g1_vals=[(p1.zk.g1_vals[0] + 1) % MOD]
                           + p1.zk.g1_vals[1:])
    assert not spartan.verify(index, srs, [35], p1._replace(zk=badzk),
                              zk_params=params)
    # tampered witness eval rejected
    bad = p1._replace(w_eval=(p1.w_eval + 1) % MOD)
    assert not spartan.verify(index, srs, [35], bad, zk_params=params)
