"""Sumcheck engine: public and Rep3-shared prover vs host verifier."""

import jax
import jax.numpy as jnp

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import poly as P
from co_zkvms_tpu.ops import sumcheck as SC
from co_zkvms_tpu.ops import transcript as T
from co_zkvms_tpu.parallel import mpc, shares as S
from co_zkvms_tpu.parallel.rng import CorrelatedRng

FR = F.FR
MOD = FR.modulus


def _msgs_to_ints(round_msgs):
    vals = F.to_int(FR, round_msgs)  # [nv, d+1] object array
    return [[int(v) for v in row] for row in vals]


def comb_prod(polys):
    return F.mul(FR, polys[0], polys[1])


def test_public_sumcheck_product(rng):
    nv = 5
    p_ints = [rng.randrange(MOD) for _ in range(1 << nv)]
    q_ints = [rng.randrange(MOD) for _ in range(1 << nv)]
    claim = sum(a * b for a, b in zip(p_ints, q_ints)) % MOD

    p = F.from_int(FR, p_ints)
    q = F.from_int(FR, q_ints)
    state = T.init(b"sumcheck-test")
    res = SC.prove(FR, state, [p, q], degree=2, comb=comb_prod)

    ht = T.HostTranscript(b"sumcheck-test")
    rs, final_claim = SC.verify(_msgs_to_ints(res.round_msgs), claim, ht)

    # final claim == p(r) * q(r)
    import tests.test_poly as tp

    pr = tp.mle_eval_ints(p_ints, rs)
    qr = tp.mle_eval_ints(q_ints, rs)
    assert final_claim == pr * qr % MOD
    # prover's challenges match the host transcript's
    got_rs = [int(v) for v in F.to_int(FR, res.challenges)]
    assert got_rs == rs
    # final bound tables agree
    assert int(F.to_int(FR, res.final_polys[0][0])) == pr


def test_public_sumcheck_rejects_wrong_claim(rng):
    nv = 3
    p_ints = [rng.randrange(MOD) for _ in range(1 << nv)]
    q_ints = [rng.randrange(MOD) for _ in range(1 << nv)]
    claim = (sum(a * b for a, b in zip(p_ints, q_ints)) + 1) % MOD
    res = SC.prove(
        FR,
        T.init(b"sumcheck-test"),
        [F.from_int(FR, p_ints), F.from_int(FR, q_ints)],
        degree=2,
        comb=comb_prod,
    )
    ht = T.HostTranscript(b"sumcheck-test")
    try:
        SC.verify(_msgs_to_ints(res.round_msgs), claim, ht)
        assert False, "should have rejected"
    except ValueError:
        pass


def comb_eq_times_shared_sq(polys):
    """eq (public) * x * x (shared): degree 3 per variable."""
    eq, x = polys
    xx = mpc.mul(FR, x, x)  # additive shares of x^2
    return F.mul(FR, eq[None] if eq.ndim == 2 else eq, xx)


def test_rep3_sumcheck_with_masks(rng):
    nv = 4
    degree = 3
    x_ints = [rng.randrange(MOD) for _ in range(1 << nv)]
    tau = [rng.randrange(MOD) for _ in range(nv)]
    eq_tab = P.eq_table(FR, F.from_int(FR, tau))
    eq_ints = [int(v) for v in F.to_int(FR, eq_tab)]
    claim = sum(e * x * x for e, x in zip(eq_ints, x_ints)) % MOD

    sx = S.share(FR, jax.random.key(11), F.from_int(FR, x_ints))
    crng = CorrelatedRng.create(jax.random.key(12))
    masks = jnp.stack(
        [crng.zero_shares(FR, j, (degree + 1,)) for j in range(nv)]
    )  # [nv, 3, d+1, 16]

    res = SC.prove(
        FR,
        T.init(b"rep3-sumcheck"),
        [eq_tab, sx],
        degree=degree,
        comb=comb_eq_times_shared_sq,
        masks=masks,
        shared=True,
    )
    ht = T.HostTranscript(b"rep3-sumcheck")
    rs, final_claim = SC.verify(_msgs_to_ints(res.round_msgs), claim, ht)

    import tests.test_poly as tp

    xr = tp.mle_eval_ints(x_ints, rs)
    eqr = tp.mle_eval_ints(eq_ints, rs)
    assert final_claim == eqr * xr * xr % MOD
    # the shared final table still combines to x(r)
    xfin = int(F.to_int(FR, S.combine(FR, res.final_polys[1])[0]))
    assert xfin == xr


def comb_eq3(polys):
    eq, a, b = polys
    return F.mul(FR, eq, F.mul(FR, a, b))


def test_eq_split_identical_messages(rng):
    """Dao-Thaler split-eq: SC.prove(eq_split=taus) produces IDENTICAL
    round messages and challenges to passing the full eq table as polys[0]
    — the eq factor is never streamed nor bound (VERDICT r2 #7)."""
    for nv in (4, 13):           # fixed-only and chunked+fixed regimes
        n = 1 << nv
        taus_i = [rng.randrange(MOD) for _ in range(nv)]
        a_i = [rng.randrange(MOD) for _ in range(n)]
        b_i = [rng.randrange(MOD) for _ in range(n)]
        taus = F.from_int(FR, taus_i)
        a = F.from_int(FR, a_i)
        b = F.from_int(FR, b_i)
        eq = P.eq_table(FR, taus)

        res_ref = SC.prove(FR, T.init(b"dt"), [eq, a, b], degree=3,
                           comb=comb_eq3)
        res_dt = SC.prove(FR, T.init(b"dt"), [a, b], degree=3,
                          comb=comb_eq3, eq_split=taus)
        assert _msgs_to_ints(res_dt.round_msgs) == \
            _msgs_to_ints(res_ref.round_msgs), nv
        assert [int(v) for v in F.to_int(FR, res_dt.challenges)] == \
            [int(v) for v in F.to_int(FR, res_ref.challenges)]
        # bound tables: dt's polys[0] is a, matching ref's polys[1]
        assert int(F.to_int(FR, res_dt.final_polys[0][0])) == \
            int(F.to_int(FR, res_ref.final_polys[1][0]))


def test_eq_split_shared(rng):
    """Split-eq on the Rep3 path: identical opened messages."""
    nv = 5
    n = 1 << nv
    taus_i = [rng.randrange(MOD) for _ in range(nv)]
    a_i = [rng.randrange(MOD) for _ in range(n)]
    b_i = [rng.randrange(MOD) for _ in range(n)]
    taus = F.from_int(FR, taus_i)
    eq = P.eq_table(FR, taus)
    a = F.from_int(FR, a_i)
    b = F.from_int(FR, b_i)
    crng = CorrelatedRng.create(jax.random.key(3))
    masks = jnp.stack([crng.zero_shares(FR, j, (4,)) for j in range(nv)])

    def comb_shared(polys):
        eqp, ash, bsh = polys
        return F.mul(FR, eqp[None], F.mul(FR, ash, S.b_component(bsh)))

    def comb_pub(polys):
        eqp, ap, bp = polys
        return F.mul(FR, eqp, F.mul(FR, ap, bp))

    # reference: plain prover on the plaintext product a * roll-combined b
    a_sh = S.share(FR, jax.random.key(5), a)
    b_sh = S.share(FR, jax.random.key(6), b)
    ref = SC.prove(FR, T.init(b"dt3"), [eq, a_sh, b_sh], degree=3,
                   comb=comb_shared, masks=masks, shared=True)
    dt = SC.prove(FR, T.init(b"dt3"), [a_sh, b_sh], degree=3,
                  comb=comb_shared, masks=masks, shared=True, eq_split=taus)
    assert _msgs_to_ints(dt.round_msgs) == _msgs_to_ints(ref.round_msgs)
