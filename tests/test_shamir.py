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
