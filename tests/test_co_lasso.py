"""co-Lasso (Rep3 shared-witness instruction lookups) vs single-party.

(The shared-collation kernel's cold compile was ~45 min in round 2; the
t-batched + chunk-scanned sumcheck engine brought the whole module to
~4 min cold, so the COZK_SKIP_HEAVY gate is gone.)"""

import jax
import pytest

from co_zkvms_tpu.models.jolt import co_lasso, lasso
from co_zkvms_tpu.models.jolt import subtables as ST
from co_zkvms_tpu.ops import pst13
from tests.test_lasso import _expected


@pytest.fixture(autouse=True, scope="module")
def small_tables():
    ST.set_config(4)
    yield
    ST.set_config(16)


@pytest.fixture(scope="module")
def srs():
    return pst13.setup_cached(8, seed=21)


@pytest.mark.slow
def test_co_lasso_matches_single_party(rng, srs):
    w = ST.WORD
    names = ("ADD", "AND", "EQ", "SUB", "XOR")
    queries = []
    for _ in range(7):
        op = names[rng.randrange(len(names))]
        x = rng.randrange(1 << w)
        y = rng.randrange(1 << w)
        queries.append((op, x, y, _expected(op, x, y, w)))

    wit = lasso.build_witness(queries, instr_names=names)
    single = lasso.prove(wit, srs)

    shared_wit = co_lasso.share_witness(wit, jax.random.key(3))
    mpc_proof = co_lasso.prove_rep3(shared_wit, srs,
                                    mask_key=jax.random.key(4))
    # bit-identical proof: masks cancel, share sums reproduce the plaintext
    assert mpc_proof == single

    log_n = wit.n.bit_length() - 1
    assert lasso.verify(mpc_proof, names, log_n, srs)
