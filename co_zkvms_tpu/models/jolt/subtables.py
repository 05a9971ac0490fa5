"""Lasso subtables: materialized 2^16-entry lookup tables on device.

Maps jolt-core's subtable layer as consumed by the reference
(co-jolt/src/jolt/instruction/*, SURVEY.md §2.8 "Instruction set"): a 32-bit
operand pair (x, y) is split into C = 4 chunks of 16 bits, chunk_i =
(x_byte_i << 8) | y_byte_i, each chunk indexes into per-subtable MLE tables
of size M = 2^16; an instruction's output is a "collation" polynomial over
the per-chunk subtable values.

Tables are generated once on device from integer formulas (uint32 math, then
lifted to field limbs) — this is the TPU replacement for jolt-core's
``materialize``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import field as F
from ...ops.field import FR

C = 4            # chunks per operand pair
LOG_M = 16       # log2 subtable size (architectural default)
M = 1 << LOG_M
BYTE = LOG_M // 2       # per-operand bits per chunk
WORD = C * BYTE         # operand width covered by the decomposition (32)


def set_config(log_m: int):
    """Reconfigure subtable geometry (tests use small tables; the
    architectural default is C=4, M=2^16, 32-bit operands)."""
    global LOG_M, M, BYTE, WORD
    LOG_M = log_m
    M = 1 << LOG_M
    BYTE = LOG_M // 2
    WORD = C * BYTE


def interleave_chunks(x: int, y: int):
    """(x, y) 32-bit -> C chunk indices, chunk_i = x_byte || y_byte.

    Chunk 0 is the MOST significant byte pair (Jolt convention: big-endian
    concatenation when collating with 2^(8*(C-1-i)) weights).
    """
    out = []
    for i in range(C):
        shift = BYTE * (C - 1 - i)
        xb = (x >> shift) & ((1 << BYTE) - 1)
        yb = (y >> shift) & ((1 << BYTE) - 1)
        out.append((xb << BYTE) | yb)
    return out


def chunks_of_index(idx: int):
    """Split a (up to) 64-bit lookup index into C chunks of 16 bits, chunk 0
    most significant. Used by single-operand instructions (ADD truncation)."""
    out = []
    for i in range(C):
        out.append((idx >> (LOG_M * (C - 1 - i))) & (M - 1))
    return out


def _idx_xy():
    idx = np.arange(M, dtype=np.uint32)
    return idx >> BYTE, idx & ((1 << BYTE) - 1)


_SUBTABLE_FNS = {}


def subtable(name):
    def wrap(fn):
        _SUBTABLE_FNS[name] = fn
        return fn
    return wrap


@subtable("and")
def _and():
    x, y = _idx_xy()
    return x & y


@subtable("or")
def _or():
    x, y = _idx_xy()
    return x | y


@subtable("xor")
def _xor():
    x, y = _idx_xy()
    return x ^ y


@subtable("identity")
def _identity():
    return np.arange(M, dtype=np.uint64)


@subtable("eq")
def _eq():
    x, y = _idx_xy()
    return (x == y).astype(np.uint32)


@subtable("ltu")
def _ltu():
    x, y = _idx_xy()
    return (x < y).astype(np.uint32)


@subtable("lt_abs")
def _lt_abs():
    # compare with the top bit masked off (for signed comparison chunk 0)
    x, y = _idx_xy()
    m = (1 << (BYTE - 1)) - 1
    return ((x & m) < (y & m)).astype(np.uint32)


@subtable("eq_abs")
def _eq_abs():
    x, y = _idx_xy()
    m = (1 << (BYTE - 1)) - 1
    return ((x & m) == (y & m)).astype(np.uint32)


@subtable("left_msb")
def _left_msb():
    x, _ = _idx_xy()
    return (x >> (BYTE - 1)).astype(np.uint32)


@subtable("right_msb")
def _right_msb():
    _, y = _idx_xy()
    return (y >> (BYTE - 1)).astype(np.uint32)


@subtable("zero_x")
def _zero_x():
    """LeftIsZeroSubtable: x-half == 0."""
    x, _ = _idx_xy()
    return (x == 0).astype(np.uint32)


@subtable("zero_y")
def _zero_y():
    """RightIsZeroSubtable: y-half == 0."""
    _, y = _idx_xy()
    return (y == 0).astype(np.uint32)


@subtable("div0")
def _div0():
    """DivByZeroSubtable: x == 0 AND y == all-ones (divisor 0, quotient max)."""
    x, y = _idx_xy()
    return ((x == 0) & (y == (1 << BYTE) - 1)).astype(np.uint32)


@subtable("lsb_zero")
def _lsb_zero():
    """Low bit of the (single-operand) chunk is zero — halfword alignment."""
    idx = np.arange(M, dtype=np.uint32)
    return (1 - (idx & 1)).astype(np.uint32)


# --- shift family (SllSubtable / SrlSubtable / SraSignSubtable semantics) ----
# Layout "shift": chunk_i = x_byte_i || (y % WORD). Subtable sll_j / srl_j is
# for the x-byte at bit position BYTE*j from the LSB (j = C-1-i for chunk i).


def _idx_x_shift():
    idx = np.arange(M, dtype=np.uint64)
    x = idx >> BYTE
    s = (idx & ((1 << BYTE) - 1)) % WORD
    return x, s


def _make_sll(j):
    def fn():
        x, s = _idx_x_shift()
        # (x << s) truncated to the bits that stay inside the word when the
        # byte sits at position BYTE*j (jolt-core SllSubtable<j>)
        return (x << s) % (1 << np.uint64(WORD - BYTE * j))
    return fn


def _make_srl(j):
    def fn():
        x, s = _idx_x_shift()
        # (x * 2^(BYTE*j)) >> s — absolutely positioned (SrlSubtable<j>)
        return (x << np.uint64(BYTE * j)) >> s
    return fn


for _j in range(C):
    _SUBTABLE_FNS[f"sll_{_j}"] = _make_sll(_j)
    _SUBTABLE_FNS[f"srl_{_j}"] = _make_srl(_j)


@subtable("sra_sign")
def _sra_sign():
    """Sign-extension padding for SRA (SraSignSubtable): applied at chunk 0,
    whose x-byte holds the operand's sign bit."""
    x, s = _idx_x_shift()
    sign = x >> (BYTE - 1)
    ones = (np.uint64(1) << s) - 1
    return sign * (ones << (np.uint64(WORD) - s))


# --- single-operand family (layout "x": chunks_of_index of the operand) -----


@subtable("pow2")
def _pow2():
    """POW2Instruction table (virtual_pow2.rs:36-38): 2^(idx % WORD)."""
    idx = np.arange(M, dtype=np.uint64)
    return np.uint64(1) << (idx % WORD)


@subtable("rs_padding")
def _rs_padding():
    """RightShiftPadding (virtual_right_shift_padding.rs:38-42):
    ((1<<s)-1) << (WORD-s), s = idx % WORD."""
    idx = np.arange(M, dtype=np.uint64)
    s = idx % WORD
    return ((np.uint64(1) << s) - 1) << (np.uint64(WORD) - s)


@subtable("sign_hi")
def _sign_hi():
    """MSB of a full LOG_M-bit chunk (for MOVSIGN's sign bit at chunk C/2)."""
    idx = np.arange(M, dtype=np.uint32)
    return (idx >> (LOG_M - 1)).astype(np.uint32)


# --- sign-extension pairs (LB/LH load sequences) -----------------------------
# SEXT_b(x) sign-extends the low b bits of the operand to WORD bits. The
# b-bit value may span two chunks: the ``lo`` table is read at chunk C-1 and,
# when LOG_M >= b, alone holds the full sign-extended value (``hi`` is zero);
# when LOG_M < b, ``lo`` is the identity on the low chunk and ``hi`` (read at
# chunk C-2) contributes bits LOG_M..b-1 plus the sign padding.


def _make_sext_lo(b):
    def fn():
        idx = np.arange(M, dtype=np.uint64)
        if LOG_M >= b:
            h = idx & np.uint64((1 << b) - 1)
            if WORD <= b:
                return h % (1 << WORD)
            sign = (h >> np.uint64(b - 1)) & 1
            return h + sign * (
                ((np.uint64(1) << np.uint64(WORD - b)) - 1) << np.uint64(b)
            )
        return idx
    return fn


def _make_sext_hi(b):
    def fn():
        idx = np.arange(M, dtype=np.uint64)
        if LOG_M >= b:
            return np.zeros_like(idx)
        top = b - LOG_M           # value bits carried by this chunk
        h = idx & np.uint64((1 << top) - 1)
        val = h << np.uint64(LOG_M)
        if WORD <= b:
            return val % (1 << WORD)
        sign = (h >> np.uint64(top - 1)) & 1
        return val + sign * (
            ((np.uint64(1) << np.uint64(WORD - b)) - 1) << np.uint64(b)
        )
    return fn


for _b in (8, 16):
    _SUBTABLE_FNS[f"sext{_b}_lo"] = _make_sext_lo(_b)
    _SUBTABLE_FNS[f"sext{_b}_hi"] = _make_sext_hi(_b)


_mat_cache = {}


def materialize(name: str):
    """Device MLE table [M, 16] (Montgomery) of the named subtable."""
    key = ("dev", name, LOG_M)
    if key not in _mat_cache:
        vals = _SUBTABLE_FNS[name]()
        _mat_cache[key] = F.from_int(FR, [int(v) for v in vals])
    return _mat_cache[key]


def materialize_ints(name: str):
    """Host int list (for witness generation gathers)."""
    key = ("int", name, LOG_M)
    if key not in _mat_cache:
        _mat_cache[key] = [int(v) for v in _SUBTABLE_FNS[name]()]
    return _mat_cache[key]


def evaluate_mle_ints(name: str, point):
    """Subtable MLE evaluated at a host point (verifier side).

    Generic path: O(M) with the int table — fine for the host verifier at
    M = 2^16; closed-form per-subtable evaluations are a later optimization
    (jolt-core evaluates these in O(log M)).
    """
    table = materialize_ints(name)
    acc = table
    MOD = FR.modulus
    for r in point:
        acc = [
            (acc[2 * j] + r * (acc[2 * j + 1] - acc[2 * j])) % MOD
            for j in range(len(acc) // 2)
        ]
    return acc[0]


ALL_SUBTABLES = tuple(sorted(_SUBTABLE_FNS.keys()))
