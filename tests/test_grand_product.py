"""GKR batched grand products: public and Rep3-shared provers vs verifier."""

import jax
import jax.numpy as jnp
import pytest

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import grand_product as GP
from co_zkvms_tpu.ops import transcript as T
from co_zkvms_tpu.parallel import shares as Sh
from co_zkvms_tpu.parallel.rng import CorrelatedRng
from tests.test_poly import mle_eval_ints

MOD = F.FR.modulus


def _check(leaves_ints, res_point, res_claims):
    """Final claims must equal the leaf MLEs at the final point."""
    for b, leaf in enumerate(leaves_ints):
        assert res_claims[b] == mle_eval_ints(leaf, res_point)


def test_grand_product_public(rng):
    b_sz, n = 3, 16
    leaves_ints = [[rng.randrange(1, MOD) for _ in range(n)] for _ in range(b_sz)]
    leaves = F.from_int(F.FR, leaves_ints)

    state = T.init(b"gp-test")
    state, proof, point, claims = GP.prove_batched(state, leaves)

    # products correct
    for b in range(b_sz):
        want = 1
        for v in leaves_ints[b]:
            want = want * v % MOD
        assert proof.products[b] == want

    ht = T.HostTranscript(b"gp-test")
    v_point, v_claims = GP.verify_batched(proof, ht)
    assert v_point == [int(x) for x in F.to_int(F.FR, point)]
    assert v_claims == GP._to_ints(claims)
    _check(leaves_ints, v_point, v_claims)

    # verifier transcript stays in sync with prover state
    assert T.HostTranscript.from_device_state(state).state == ht.state


def test_grand_product_rejects_tamper(rng):
    b_sz, n = 2, 8
    leaves_ints = [[rng.randrange(1, MOD) for _ in range(n)] for _ in range(b_sz)]
    leaves = F.from_int(F.FR, leaves_ints)
    state = T.init(b"gp-test2")
    _, proof, _, _ = GP.prove_batched(state, leaves)
    bad = proof._replace(products=[(proof.products[0] + 1) % MOD] + proof.products[1:])
    with pytest.raises(ValueError):
        GP.verify_batched(bad, T.HostTranscript(b"gp-test2"))


def test_grand_product_rep3(rng):
    b_sz, n = 2, 16
    leaves_ints = [[rng.randrange(1, MOD) for _ in range(n)] for _ in range(b_sz)]
    flat = [v for row in leaves_ints for v in row]
    secret = F.from_int(F.FR, leaves_ints)  # [B, n, 16]
    lshares = Sh.share(F.FR, jax.random.key(5), secret)  # [3, B, n, 16]
    crng = CorrelatedRng.create(jax.random.key(6))

    state = T.init(b"gp-rep3")
    state, proof, point, claims = GP.prove_batched(
        state, lshares, shared=True, masks_rng=crng
    )
    # identical to the public proof for the same leaves
    state2 = T.init(b"gp-rep3")
    _, proof_pub, _, _ = GP.prove_batched(state2, secret)
    assert proof == proof_pub

    ht = T.HostTranscript(b"gp-rep3")
    v_point, v_claims = GP.verify_batched(proof, ht)
    _check(leaves_ints, v_point, v_claims)
