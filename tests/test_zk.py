"""ZK machinery: mask polynomials, mask KZG, hiding PST13, zk sumcheck."""

import random

import pytest

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import poly as P
from co_zkvms_tpu.ops import pst13
from co_zkvms_tpu.ops import sumcheck as SC
from co_zkvms_tpu.ops import transcript as T
from co_zkvms_tpu.ops import zk

MOD = F.FR.modulus
SEED = 33


@pytest.fixture(scope="module")
def srs():
    return pst13.setup_cached(4, seed=SEED)


@pytest.fixture(scope="module")
def params():
    return zk.from_seed(4, seed=SEED, max_deg=4)


def test_mask_commit_open_verify(rng, params):
    coeffs, _ = zk.generate_mask(rng, 4, 3)
    comms = zk.commit_mask(params, coeffs)
    point = [rng.randrange(MOD) for _ in range(4)]
    vals, proofs = zk.open_mask(params, coeffs, point)
    assert sum(vals) % MOD == zk.mask_eval_ints(coeffs, point)
    assert zk.verify_mask(params, comms, point, vals, proofs)
    bad = [(vals[0] + 1) % MOD] + vals[1:]
    assert not zk.verify_mask(params, comms, point, bad, proofs)


def test_hiding_commitment(rng, srs, params):
    table_i = [rng.randrange(MOD) for _ in range(16)]
    table = F.from_int(F.FR, table_i)
    r = rng.randrange(MOD)
    comm = zk.hide_commit(srs, params, table, r)
    # different blinder -> different commitment for the same table (hiding)
    comm2 = zk.hide_commit(srs, params, table, (r + 1) % MOD)
    assert comm.xy != comm2.xy

    point_i = [rng.randrange(MOD) for _ in range(4)]
    point = F.from_int(F.FR, point_i)
    value, proof = zk.hide_open(srs, params, table, point, r, rng)
    from tests.test_poly import mle_eval_ints

    assert value == mle_eval_ints(table_i, point_i)
    assert zk.hide_check(srs, params, comm, point_i, value, proof)
    assert not zk.hide_check(srs, params, comm, point_i,
                             (value + 1) % MOD, proof)
    # two openings of the same claim are differently randomized but both ok
    value2, proof2 = zk.hide_open(srs, params, table, point, r,
                                  random.Random(99))
    assert proof2 != proof
    assert zk.hide_check(srs, params, comm, point_i, value2, proof2)


def test_zk_sumcheck_mask(rng):
    """Masked zerocheck: messages differ from unmasked, verifier recovers
    the subclaim by subtracting rho1 * g(z)."""
    nv, degree = 3, 3
    n = 1 << nv
    # p = eq * (a*b - c) with a*b == c pointwise -> zerocheck
    a_i = [rng.randrange(MOD) for _ in range(n)]
    b_i = [rng.randrange(MOD) for _ in range(n)]
    c_i = [x * y % MOD for x, y in zip(a_i, b_i)]
    r_pt = [rng.randrange(MOD) for _ in range(nv)]
    eq = P.eq_table(F.FR, F.from_int(F.FR, r_pt))
    tabs = [eq] + [F.from_int(F.FR, t) for t in (a_i, b_i, c_i)]

    def comb(polys, consts=None):
        e, a, b, c = polys
        return F.mul(F.FR, e, F.sub(F.FR, F.mul(F.FR, a, b), c))

    coeffs, coeffs_dev = zk.generate_mask(rng, nv, degree)
    rho1_i = rng.randrange(MOD)
    rho1 = F.from_int(F.FR, rho1_i)
    g_sum = zk.mask_sum_ints(coeffs)

    ht = T.HostTranscript(b"zk-test")
    res = SC.prove(F.FR, ht.device_state(), tabs, degree=degree, comb=comb,
                   zk_mask=(rho1, coeffs_dev))
    ht.state = T.HostTranscript.from_device_state(res.state).state
    msgs = SC.round_msgs_to_ints(res.round_msgs)

    # verify: claim = 0 + rho1 * g_sum
    ht2 = T.HostTranscript(b"zk-test")
    claim = rho1_i * g_sum % MOD
    z, expected = SC.verify(msgs, claim, ht2)

    g_z = zk.mask_eval_ints(coeffs, z)
    a_z = int(F.to_int(F.FR, res.final_polys[1][..., 0, :]))
    b_z = int(F.to_int(F.FR, res.final_polys[2][..., 0, :]))
    c_z = int(F.to_int(F.FR, res.final_polys[3][..., 0, :]))
    eq_z = 1
    for rv, zv in zip(r_pt, z):
        eq_z = eq_z * (rv * zv + (1 - rv) * (1 - zv)) % MOD
    got = (eq_z * (a_z * b_z - c_z) + rho1_i * g_z) % MOD
    assert got == expected

    # unmasked messages differ (the mask actually does something)
    ht3 = T.HostTranscript(b"zk-test")
    res0 = SC.prove(F.FR, ht3.device_state(), tabs, degree=degree, comb=comb)
    assert SC.round_msgs_to_ints(res0.round_msgs) != msgs
