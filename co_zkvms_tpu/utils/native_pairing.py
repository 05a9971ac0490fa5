"""ctypes bridge to the native BN254 pairing verifier (native/bn254_host.cpp).

The host verifier's cost is the PST13 pairing product (nv+1 pairings per
opening); the pure-Python oracle (ops/ref_bn254.py) takes seconds per check.
This module compiles the C++ companion on first use (g++ -O3 -shared) into a
per-machine cache dir and exposes ``multi_pairing_is_one(pairs)`` with the
exact same semantics; pst13.verify_open dispatches here when the toolchain
is available and falls back to the Python oracle otherwise.

Bit-equivalence native<->oracle is tested (tests/test_native_pairing.py).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import tempfile

from ..ops.field import FQ_MODULUS, FR_MODULUS

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "bn254_host.cpp")

FINAL_EXP = (FQ_MODULUS ** 12 - 1) // FR_MODULUS
_FEXP_NBITS = FINAL_EXP.bit_length()
_FEXP_BYTES = FINAL_EXP.to_bytes((_FEXP_NBITS + 7) // 8, "little")


def _to_limbs(x: int) -> list[int]:
    return [(x >> (64 * i)) & ((1 << 64) - 1) for i in range(4)]


@functools.lru_cache(maxsize=1)
def _lib():
    """Compile (once per machine) and load the shared library; None if the
    toolchain is missing or the build fails."""
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    cache = os.path.join(tempfile.gettempdir(), "co_zkvms_native")
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, "libbn254host.so")
    if not os.path.exists(so_path) or (
        os.path.getmtime(so_path) < os.path.getmtime(src)
    ):
        tmp = so_path + f".{os.getpid()}.tmp"
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True, timeout=300,
            )
            os.replace(tmp, so_path)
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.multi_pairing_is_one.restype = ctypes.c_int
    lib.multi_pairing_is_one.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.pairing_raw.restype = None
    lib.pairing_raw.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    return lib


def available() -> bool:
    return _lib() is not None


def _pack_points(pairs):
    """ref_bn254-style (g1_pt, g2_pt) pairs -> flat limb arrays."""
    n = len(pairs)
    g1 = (ctypes.c_uint64 * (8 * n))()
    g2 = (ctypes.c_uint64 * (16 * n))()
    for k, (p, q) in enumerate(pairs):
        if p is not None:
            limbs = _to_limbs(p[0].coeffs[0]) + _to_limbs(p[1].coeffs[0])
            for i, v in enumerate(limbs):
                g1[8 * k + i] = v
        if q is not None:
            limbs = (_to_limbs(q[0].coeffs[0]) + _to_limbs(q[0].coeffs[1])
                     + _to_limbs(q[1].coeffs[0]) + _to_limbs(q[1].coeffs[1]))
            for i, v in enumerate(limbs):
                g2[16 * k + i] = v
    return g1, g2, n


def multi_pairing_is_one(pairs) -> bool:
    """Native prod e(P_i, Q_i) == 1 check. Same inputs as
    ref_bn254.multi_pairing_is_one. Raises if the library is unavailable
    (callers gate on available())."""
    lib = _lib()
    pairs = list(pairs)
    g1, g2, n = _pack_points(pairs)
    bits = (ctypes.c_uint8 * len(_FEXP_BYTES)).from_buffer_copy(_FEXP_BYTES)
    return bool(lib.multi_pairing_is_one(g1, g2, n, bits, _FEXP_NBITS))


def pairing_coeffs(p_g1, q_g2) -> tuple:
    """e(P, Q) as the 12 FQ12 coefficients (ints) — differential testing."""
    lib = _lib()
    g1, g2, _ = _pack_points([(p_g1, q_g2)])
    bits = (ctypes.c_uint8 * len(_FEXP_BYTES)).from_buffer_copy(_FEXP_BYTES)
    out = (ctypes.c_uint64 * 48)()
    lib.pairing_raw(g1, g2, bits, _FEXP_NBITS, out)
    return tuple(
        sum(out[4 * i + j] << (64 * j) for j in range(4)) for i in range(12)
    )
