"""Toggled (sparse) grand products (VERDICT missing #5 / next-round #8b):
flag-toggled leaves E = f*fp + 1 - f with a leaf-reduction sumcheck tying
the GKR bottom claim to committed-fp + public-flag evaluations — E is never
committed (sparse_grand_product.rs semantics)."""

import random

import jax
import numpy as np

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import grand_product as GP
from co_zkvms_tpu.ops import transcript as T
from co_zkvms_tpu.ops.field import FR
from co_zkvms_tpu.parallel import shares as Sh

MOD = FR.modulus
LABEL = b"test/toggled_gp"


def _eval_mle_ints(vals, point):
    cur = [v % MOD for v in vals]
    for r in point:
        half = len(cur) // 2
        cur = [(cur[2 * i] + r * (cur[2 * i + 1] - cur[2 * i])) % MOD
               for i in range(half)]
    return cur[0]


def _setup(rng, b=2, n=16, density=0.3):
    flags = [[1 if rng.random() < density else 0 for _ in range(n)]
             for _ in range(b)]
    fps = [[rng.randrange(MOD) for _ in range(n)] for _ in range(b)]
    flags_dev = jnp.stack([F.from_int(FR, row) for row in flags])
    fps_dev = jnp.stack([F.from_int(FR, row) for row in fps])
    return flags, fps, flags_dev, fps_dev


import jax.numpy as jnp


def test_toggled_matches_host_products():
    rng = random.Random(3)
    flags, fps, flags_dev, fps_dev = _setup(rng)
    state = T.HostTranscript(LABEL).device_state()
    state, proof, point = GP.prove_toggled(state, flags_dev, fps_dev)
    for bi in range(len(flags)):
        want = 1
        for f, fp in zip(flags[bi], fps[bi]):
            want = want * ((f * fp + 1 - f) % MOD) % MOD
        assert proof.gp.products[bi] == want


def test_toggled_verifies_and_rejects_tamper():
    rng = random.Random(4)
    flags, fps, flags_dev, fps_dev = _setup(rng)
    state = T.HostTranscript(LABEL).device_state()
    state, proof, point = GP.prove_toggled(state, flags_dev, fps_dev)

    def flag_eval(rs):
        return [_eval_mle_ints(row, rs) for row in flags]

    ht = T.HostTranscript(LABEL)
    rs, fp_claims = GP.verify_toggled(proof, ht, flag_eval)
    # fp claims really are the fingerprint MLE evals at rs
    for bi, row in enumerate(fps):
        assert fp_claims[bi] == _eval_mle_ints(row, rs)

    bad = proof._replace(fp_claims=[(proof.fp_claims[0] + 1) % MOD]
                         + proof.fp_claims[1:])
    ht2 = T.HostTranscript(LABEL)
    try:
        GP.verify_toggled(bad, ht2, flag_eval)
        raise AssertionError("tampered fp claim accepted")
    except ValueError:
        pass


def test_toggled_shared_bit_identical():
    rng = random.Random(5)
    flags, fps, flags_dev, fps_dev = _setup(rng)
    state = T.HostTranscript(LABEL).device_state()
    _, proof_pub, _ = GP.prove_toggled(state, flags_dev, fps_dev)

    from co_zkvms_tpu.parallel.rng import CorrelatedRng

    fps_sh = Sh.share(FR, jax.random.key(8), fps_dev)
    state = T.HostTranscript(LABEL).device_state()
    _, proof_sh, _ = GP.prove_toggled(state, flags_dev, fps_sh, shared=True,
                                      masks_rng=CorrelatedRng.create(
                                          jax.random.key(9)))
    assert proof_sh == proof_pub


def test_toggled_all_ones_equals_dense():
    """With all flags set the toggled leaves ARE the fingerprints: products
    equal the dense grand product path's."""
    rng = random.Random(6)
    n = 16
    fps = [[rng.randrange(MOD) for _ in range(n)]]
    fps_dev = jnp.stack([F.from_int(FR, row) for row in fps])
    ones = jnp.broadcast_to(F.ones_mont(FR), (1, n, 16)).astype(jnp.uint32)

    state = T.HostTranscript(LABEL).device_state()
    _, tog, _ = GP.prove_toggled(state, ones, fps_dev)
    state = T.HostTranscript(LABEL).device_state()
    _, dense, _, _ = GP.prove_batched(state, fps_dev)
    assert tog.gp.products == dense.products
