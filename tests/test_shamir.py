"""Shamir t-of-n roundtrips (maps mpc-types shamir.rs unit tests)."""

import jax

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.parallel import shamir

FR = F.FR
MOD = FR.modulus


def test_share_reconstruct(rng):
    secrets = [rng.randrange(MOD) for _ in range(5)]
    sec = F.from_int(FR, secrets)
    shares = shamir.share(FR, jax.random.key(0), sec, t=2, n=5)
    assert shares.shape == (5, 5, F.NLIMBS)
    # any 3 of 5 reconstruct
    for ids in ([1, 2, 3], [2, 4, 5], [1, 3, 5]):
        got = [
            int(v)
            for v in F.to_int(
                FR, shamir.reconstruct(FR, [shares[i - 1] for i in ids], ids)
            )
        ]
        assert got == secrets
    # 2 shares are not enough (reconstruct gives garbage, not the secret)
    got2 = [
        int(v)
        for v in F.to_int(FR, shamir.reconstruct(FR, [shares[0], shares[1]], [1, 2]))
    ]
    assert got2 != secrets


def test_linearity(rng):
    a = [rng.randrange(MOD) for _ in range(3)]
    b = [rng.randrange(MOD) for _ in range(3)]
    sa = shamir.share(FR, jax.random.key(1), F.from_int(FR, a), t=1, n=3)
    sb = shamir.share(FR, jax.random.key(2), F.from_int(FR, b), t=1, n=3)
    ssum = F.add(FR, sa, sb)
    got = [
        int(v)
        for v in F.to_int(
            FR, shamir.reconstruct(FR, [ssum[0], ssum[1]], [1, 2])
        )
    ]
    assert got == [(x + y) % MOD for x, y in zip(a, b)]


def test_precomputed_lagrange_and_interpolation(rng):
    secrets = [rng.randrange(MOD) for _ in range(4)]
    sec = F.from_int(FR, secrets)
    shares = shamir.share(FR, jax.random.key(3), sec, t=2, n=5)
    ids = [2, 3, 5]
    sub = shares.take(jax.numpy.asarray([i - 1 for i in ids]), axis=0)
    lams = shamir.precompute_lagrange(ids)
    got = [int(v) for v in F.to_int(
        FR, shamir.reconstruct_precomputed(FR, sub, lams))]
    assert got == secrets
    # interpolate at the party points returns the original shares
    evals = shamir.interpolate_poly(FR, sub, ids, [1, 4])
    for col, x in enumerate([1, 4]):
        want = [int(v) for v in F.to_int(FR, shares[x - 1])]
        assert [int(v) for v in F.to_int(FR, evals[col])] == want


def test_point_shares(rng):
    from co_zkvms_tpu.ops import curve as C
    from co_zkvms_tpu.ops import msm as M
    from co_zkvms_tpu.ops import ref_bn254 as bn

    g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
    g1 = C.APoint(g.x[0], g.y[0])
    secret_scalars = [rng.randrange(MOD) for _ in range(2)]
    p = M.fixed_base_msm(g1, F.from_int(FR, secret_scalars))  # JPoint [2]

    shares = shamir.share_point(jax.random.key(4), p, t=1, n=3)
    want = C.points_to_ints(C.to_affine(p))
    for ids in ([1, 2], [2, 3], [1, 3]):
        sub = jax.tree.map(
            lambda a: a.take(jax.numpy.asarray([i - 1 for i in ids]), axis=0),
            shares)
        rec = shamir.reconstruct_point(sub, ids)
        assert C.points_to_ints(C.to_affine(rec)) == want
    # one share alone is a uniformly-random-looking point, not the secret
    one = jax.tree.map(lambda a: a[0], shares)
    assert C.points_to_ints(C.to_affine(one)) != want


def test_scalar_mul_public_matches_reference(rng):
    from co_zkvms_tpu.ops import curve as C
    from co_zkvms_tpu.ops import ref_bn254 as bn

    k = rng.randrange(MOD)
    g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
    gj = C.from_affine(C.APoint(g.x, g.y))
    got = C.points_to_ints(C.to_affine(shamir.scalar_mul_public(gj, k)))
    want = bn.g1_coords(bn.scalar_mul(bn.G1_GEN, k))
    assert got == [want]
