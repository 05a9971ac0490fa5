"""Poseidon: device==host bit-equality, parameter sanity, transcript mirror."""

import jax
import jax.numpy as jnp
import pytest

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import poseidon as P
from co_zkvms_tpu.ops.field import FR


def test_grain_params_sane():
    rc, mds = P.params_host(3)
    assert len(rc) == P.R_FULL + P.R_PARTIAL[3] and len(rc[0]) == 3
    flat = [v for row in rc for v in row]
    assert len(set(flat)) == len(flat)          # no repeated constants
    assert all(0 < v < FR.modulus for v in flat)
    assert P._det(mds, FR.modulus) != 0


@pytest.mark.parametrize("t", [3, 4, 5])
def test_permute_device_matches_host(t):
    vals = list(range(1, t + 1))
    dev = P.permute(F.from_int(FR, vals).reshape(t, 16))
    got = [F.to_int(FR, dev[i]) for i in range(t)]
    assert got == P.host_permute(vals)


def test_hash_device_matches_host_batched():
    import numpy as np

    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1 << 62, (5, 2))
    dev = P.hash_fes(F.from_int(FR, [int(v) for v in vals.ravel()])
                     .reshape(5, 2, 16))
    for i in range(5):
        assert F.to_int(FR, dev[i]) == P.host_hash([int(v) for v in vals[i]])


def test_hash_regression_pin():
    # pins the generated instance: a change to Grain/MDS breaks this loudly
    got = P.host_hash([1, 2])
    assert 0 < got < FR.modulus
    again = P.host_hash([1, 2])
    assert got == again
    assert P.host_hash([2, 1]) != got


def test_merkle_layer():
    leaves = F.from_int(FR, list(range(8)))
    layer = P.merkle_layer(leaves)
    assert layer.shape == (4, 16)
    assert F.to_int(FR, layer[0]) == P.host_hash([0, 1])
    assert F.to_int(FR, layer[3]) == P.host_hash([6, 7])


def test_transcript_device_matches_host():
    label = b"pos-transcript"
    st = P.transcript_init(label)
    host = P.HostPoseidonTranscript(label)
    st = P.transcript_absorb(st, F.from_int(FR, [42])[0])
    host.absorb(42)
    st, ch = P.transcript_challenge(st)
    assert F.to_int(FR, ch) == host.challenge()
    st = P.transcript_absorb(st, F.from_int(FR, [7])[0])
    host.absorb(7)
    st, ch2 = P.transcript_challenge(st)
    assert F.to_int(FR, ch2) == host.challenge()
    assert ch2 is not ch


def test_fused_kernel_matches_jnp_path():
    """The VMEM-resident Pallas permutation (interpret mode here) is
    bit-identical to the jnp composition for a t=3 batch."""
    import jax

    from co_zkvms_tpu.ops import poseidon as P
    from co_zkvms_tpu.ops import field as F
    from co_zkvms_tpu.ops.field import FR

    n = 8
    state = F.random(FR, jax.random.key(31), (n, 3))
    rc, mds = P._params_dev(3)
    want = P._permute_jit(state, 3, rc, mds)
    got = P._permute_pallas_t3(state, P.R_PARTIAL[3], rc, mds)
    import numpy as np

    assert np.array_equal(np.asarray(jax.device_get(got)),
                          np.asarray(jax.device_get(want)))
