"""Rep3 share algebra: share/combine roundtrips, MPC mul, correlated rng.

Mirrors the reference's unit tests (mpc-core/src/protocols/rep3/binary.rs
roundtrips; SURVEY.md §4): single-process 3-party simulation — share, run all
parties' compute, combine, compare to plaintext.
"""

import jax
import jax.numpy as jnp
import numpy as np

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.parallel import mpc, shares as S
from co_zkvms_tpu.parallel.rng import CorrelatedRng

FR = F.FR
MOD = FR.modulus


def test_share_combine_roundtrip(rng):
    xs = [rng.randrange(MOD) for _ in range(8)]
    secret = F.from_int(FR, xs)
    sh = S.share(FR, jax.random.key(0), secret)
    assert sh.shape == (3, 8, F.NLIMBS)
    back = [int(v) for v in F.to_int(FR, S.combine(FR, sh))]
    assert back == xs
    # shares are nondegenerate
    assert not jnp.array_equal(sh[0], sh[1])


def test_seeded_share_roundtrip(rng):
    xs = [rng.randrange(MOD) for _ in range(5)]
    secret = F.from_int(FR, xs)
    keys, explicit = S.share_seeded(FR, jax.random.key(7), secret)
    sh = S.expand_seeded(FR, keys, explicit, (5,))
    back = [int(v) for v in F.to_int(FR, S.combine(FR, sh))]
    assert back == xs


def test_mpc_mul(rng):
    n = 16
    xs = [rng.randrange(MOD) for _ in range(n)]
    ys = [rng.randrange(MOD) for _ in range(n)]
    sx = S.share(FR, jax.random.key(1), F.from_int(FR, xs))
    sy = S.share(FR, jax.random.key(2), F.from_int(FR, ys))
    crng = CorrelatedRng.create(jax.random.key(3))
    zero = crng.zero_shares(FR, 0, (n,))
    prod = mpc.mul(FR, sx, sy, zero)
    got = [int(v) for v in F.to_int(FR, mpc.open(FR, prod))]
    assert got == [(x * y) % MOD for x, y in zip(xs, ys)]


def test_zero_shares_sum_to_zero():
    crng = CorrelatedRng.create(jax.random.key(9))
    z = crng.zero_shares(FR, 5, (4,))
    opened = [int(v) for v in F.to_int(FR, S.combine(FR, z))]
    assert opened == [0, 0, 0, 0]
    # different counters give different masks
    z2 = crng.zero_shares(FR, 6, (4,))
    assert not jnp.array_equal(z, z2)


def test_public_ops(rng):
    n = 4
    xs = [rng.randrange(MOD) for _ in range(n)]
    c = rng.randrange(MOD)
    sx = S.share(FR, jax.random.key(4), F.from_int(FR, xs))
    dc = F.from_int(FR, [c] * n)
    got_mul = [int(v) for v in F.to_int(FR, mpc.open(FR, mpc.mul_public(FR, sx, dc)))]
    assert got_mul == [(x * c) % MOD for x in xs]
    got_add = [int(v) for v in F.to_int(FR, mpc.open(FR, mpc.add_public(FR, sx, dc)))]
    assert got_add == [(x + c) % MOD for x in xs]


def test_promote_public(rng):
    xs = [rng.randrange(MOD) for _ in range(3)]
    pub = F.from_int(FR, xs)
    sh = S.promote_public(FR, pub)
    got = [int(v) for v in F.to_int(FR, mpc.open(FR, sh))]
    assert got == xs


def test_inner_product(rng):
    n = 100
    xs = [rng.randrange(MOD) for _ in range(n)]
    ys = [rng.randrange(MOD) for _ in range(n)]
    sx = S.share(FR, jax.random.key(5), F.from_int(FR, xs))
    ip = mpc.inner_product(FR, sx, F.from_int(FR, ys))
    got = int(F.to_int(FR, mpc.open(FR, ip)))
    assert got == sum(x * y for x, y in zip(xs, ys)) % MOD


def test_modsum_large(rng):
    # exercise the hierarchical reduction path (> 2^14 elements)
    n = (1 << 14) + 100
    xs = [rng.randrange(MOD) for _ in range(n)]
    arr = F.from_int(FR, xs)
    got = int(F.to_int(FR, F.modsum(FR, arr, 0)))
    assert got == sum(xs) % MOD


def test_party_sharded_mul(rng):
    """Same MPC mul with the party axis placed on a size-3 mesh axis."""
    devs = jax.devices()[:6]
    mesh = jax.sharding.Mesh(np.array(devs).reshape(3, 2), ("party", "chunk"))
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("party", "chunk")
    )
    n = 8
    xs = [rng.randrange(MOD) for _ in range(n)]
    ys = [rng.randrange(MOD) for _ in range(n)]
    sx = jax.device_put(S.share(FR, jax.random.key(1), F.from_int(FR, xs)), spec)
    sy = jax.device_put(S.share(FR, jax.random.key(2), F.from_int(FR, ys)), spec)
    prod = jax.jit(lambda a, b: mpc.mul(FR, a, b))(sx, sy)
    got = [int(v) for v in F.to_int(FR, mpc.open(FR, prod))]
    assert got == [(x * y) % MOD for x, y in zip(xs, ys)]


def test_every_model_share_mul_is_masked():
    """Every mpc.mul call-site on a prover path supplies reshare
    re-randomization (VERDICT r2 #6; maps mpc-core
    rep3/arithmetic.rs:39-48 mask-on-every-reshare): either a
    ``zero_mask=`` argument in the call, or a fresh zero share added to the
    operand immediately before the mul (the chain-premask pattern — the
    additive share is masked BEFORE its ring reshare message exists)."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1] / "co_zkvms_tpu"
    bad = []
    for path in list(root.glob("models/**/*.py")) + [
            root / "ops" / "grand_product.py"]:
        lines = path.read_text().splitlines()
        for i, ln in enumerate(lines):
            if not re.search(r"\bmpc\.mul\(", ln):
                continue
            stmt = " ".join(lines[i:i + 3])
            context = " ".join(lines[max(0, i - 10):i])
            if "zero_mask" in stmt or "zero_shares_from_keys" in context:
                continue
            bad.append(f"{path.name}:{i + 1}: {ln.strip()}")
    assert not bad, "unmasked share-muls on prover paths:\n" + "\n".join(bad)
