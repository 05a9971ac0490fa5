"""Keccak host vs known vectors; device keccak vs host; transcript mirror."""

import numpy as np
import jax
import jax.numpy as jnp

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import keccak as K
from co_zkvms_tpu.ops import transcript as T


def test_keccak256_known_vectors():
    # canonical Keccak-256 (0x01 padding) test vectors; the permutation is
    # additionally cross-checked against hashlib's SHA3 (0x06 padding) below
    assert (
        K.keccak256_host(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        K.keccak256_host(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_permutation_matches_sha3():
    import hashlib

    padded = bytearray(b"conformance")
    padded.append(0x06)  # SHA3 domain padding
    while len(padded) % K.RATE_BYTES:
        padded.append(0x00)
    padded[-1] |= 0x80
    state = [0] * 25
    for i in range(17):
        state[i] ^= int.from_bytes(padded[8 * i : 8 * i + 8], "little")
    state = K.keccak_f_host(state)
    out = b"".join(state[i].to_bytes(8, "little") for i in range(4))
    assert out == hashlib.sha3_256(b"conformance").digest()


def test_device_block_matches_host():
    # a 136-byte pre-padded block hashed on device == host sponge on raw bytes
    msg = bytes(range(100))
    padded = bytearray(msg)
    padded.append(0x01)
    while len(padded) % K.RATE_BYTES:
        padded.append(0x00)
    padded[-1] |= 0x80
    words = np.frombuffer(bytes(padded), dtype="<u4").astype(np.uint32)
    got = K.keccak256_block(jnp.asarray(words))
    got_bytes = b"".join(int(w).to_bytes(4, "little") for w in np.asarray(got))
    assert got_bytes == K.keccak256_host(msg)


def test_transcript_device_host_agree():
    label = b"co_zkvms_tpu/test"
    s = T.init(label)
    h = T.HostTranscript(label)

    vals = [3, 12345678901234567890, F.FR.modulus - 1]
    fes = F.from_int(F.FR, vals)
    s = T.absorb_fes(F.FR, s, fes)
    h.absorb_many(vals)
    s, c_dev = T.challenge_fe(s)
    c_host = h.challenge()
    assert int(F.to_int(F.FR, c_dev)) == c_host

    # continue: absorb a single element then two challenges
    s = T.absorb_fe(F.FR, s, F.from_int(F.FR, 77))
    h.absorb(77)
    s, cs = T.challenge_fes(s, 2)
    want = h.challenges(2)
    got = [int(v) for v in np.atleast_1d(F.to_int(F.FR, cs))]
    assert got == want

    # states stay in sync
    assert T.HostTranscript.from_device_state(s).state == h.state
