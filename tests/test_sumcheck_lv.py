"""Fused Pallas sumcheck rounds == the XLA chunked engine, bit-exact.

CPU keeps ONE minimal kernel-level check (interpret mode compiles the
~20k-op kernel body through XLA:CPU — minutes per variant, so exactly one
eval and one bind compile here). The full-prove bit-equality across
multiple rounds, eq-split, and both comb degrees runs on the real chip
(COZK_TEST_PLATFORM=tpu), where Mosaic compiles land in the persistent
cache."""

import jax
import jax.numpy as jnp
import pytest

from co_zkvms_tpu.models.spartan import _comb1, _comb2
from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import poly as P
from co_zkvms_tpu.ops import sumcheck as SC
from co_zkvms_tpu.ops import sumcheck_pallas as SCP
from co_zkvms_tpu.ops import transcript as T
from co_zkvms_tpu.ops.field import FR

_on_tpu = jax.default_backend() == "tpu"


@pytest.mark.skipif(not _on_tpu, reason="interpret-mode compile of the "
                    "~20k-op kernel body takes >40 min through XLA:CPU; "
                    "run with COZK_TEST_PLATFORM=tpu")
def test_lv_one_round_kernel():
    """eval_round/bind_round == hand-computed jnp round at n=512."""
    from co_zkvms_tpu.ops import ntt as _ntt

    n = 512
    nv = 9
    polys = [F.random(FR, jax.random.key(50 + i), (n,)) for i in range(4)]
    rev = jnp.asarray(_ntt._bitrev_idx(nv).astype("int32"))
    bufs = [jnp.take(p, rev, axis=0).T for p in polys]  # bit-reversed
    h = jnp.int32(n)
    n_chunks = jnp.int32(1)
    msg = SCP.eval_round(FR, 3, 4, _comb1.lv, False, bufs, None, h,
                         n_chunks)
    # reference: message evals at t = 0..3 via jnp ops, natural order
    evens = [p[0::2] for p in polys]
    odds = [p[1::2] for p in polys]
    slopes = [F.sub(FR, o, e) for o, e in zip(odds, evens)]
    want = []
    curs = list(evens)
    for t in range(4):
        if t > 0:
            curs = [F.add(FR, c, s) for c, s in zip(curs, slopes)]
        v = _comb1(curs)
        want.append(F.modsum(FR, v, 0))
    assert jnp.array_equal(msg, jnp.stack(want))

    r = F.random(FR, jax.random.key(99), ())
    outs = SCP.bind_round(FR, 4, bufs, r, h, n_chunks)
    rev_h = jnp.asarray(_ntt._bitrev_idx(nv - 1).astype("int32"))
    for ob, e, s in zip(outs, evens, slopes):
        got_b = jnp.take(ob[:, : n // 2].T, rev_h, axis=0)
        want_b = F.add(FR, e, F.mul(FR, jnp.broadcast_to(r, s.shape), s))
        assert jnp.array_equal(got_b, want_b)


@pytest.mark.skipif(not _on_tpu, reason="full-prove lv equality runs on "
                    "the chip (COZK_TEST_PLATFORM=tpu)")
@pytest.mark.parametrize("mode", ["plain", "eq_split", "deg2"])
def test_lv_prove_matches_engine(monkeypatch, mode):
    n_log2 = 10
    n = 1 << n_log2
    state = T.HostTranscript(b"lv-test").device_state()
    kw = {}
    if mode == "deg2":
        polys = [F.random(FR, jax.random.key(70 + i), (n,))
                 for i in range(2)]
        degree, comb = 2, _comb2
    else:
        polys = [F.random(FR, jax.random.key(50 + i), (n,))
                 for i in range(4)]
        degree, comb = 3, _comb1
        if mode == "eq_split":
            polys = polys[1:]
            kw["eq_split"] = F.random(FR, jax.random.key(65), (n_log2,))
    monkeypatch.setattr(SC, "LV_MODE", "off")
    ref = SC.prove(FR, state, list(polys), degree=degree, comb=comb, **kw)
    monkeypatch.setattr(SC, "LV_MODE", "auto")
    got = SC.prove(FR, state, list(polys), degree=degree, comb=comb, **kw)
    assert jnp.array_equal(ref.round_msgs, got.round_msgs)
    assert jnp.array_equal(ref.challenges, got.challenges)
    for a, b in zip(ref.final_polys, got.final_polys):
        assert jnp.array_equal(a, b)
