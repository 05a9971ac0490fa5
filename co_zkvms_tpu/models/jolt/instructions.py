"""Jolt instruction lookup specs: chunk decomposition + collation polynomials.

Maps the reference's per-instruction layer (co-jolt/src/jolt/instruction/*.rs
``to_indices`` / ``combine_lookups`` — SURVEY.md §2.8): each instruction
declares which (subtable, chunk) values it reads and how to collate them into
the 32-bit output. Collations are written once against an ops adapter so the
same definition runs on device limb arrays (sumcheck comb / witness gen) and
on host ints (verifier).

Round-1 instruction set: bitwise (AND/OR/XOR), add/sub via index truncation,
equality/comparison family (EQ/NE/LTU/GEU/SLT/GE). The remaining RV32I ops
(shifts, loads/stores virtual sequences) extend this table mechanically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from ...ops import field as F
from ...ops.field import FR
from . import subtables as ST

MOD = FR.modulus
C = ST.C


class HostOps:
    one = 1

    @staticmethod
    def add(a, b):
        return (a + b) % MOD

    @staticmethod
    def sub(a, b):
        return (a - b) % MOD

    @staticmethod
    def mul(a, b):
        return a * b % MOD

    @staticmethod
    def const(c):
        return c % MOD


class DeviceOps:
    """Ops over [..., 16] limb arrays (Montgomery)."""

    def __init__(self, like):
        self._like = like
        self.one = F.ones_mont(FR)

    @staticmethod
    def add(a, b):
        return F.add(FR, a, b)

    @staticmethod
    def sub(a, b):
        return F.sub(FR, a, b)

    @staticmethod
    def mul(a, b):
        return F.mul(FR, a, b)

    @staticmethod
    def const(c):
        import jax.numpy as jnp

        return F.from_int(FR, c % MOD)


class SharedDeviceOps:
    """Collation ops over Rep3 share stacks [3, h, 16].

    Publics (consts, the eq factor) stay [h, 16]/[16]; share-by-share
    products use the Rep3 3-term local mul; public constants add/sub via the
    party-0 convention. Detection is structural: stacks have ndim >= 3.
    """

    one = None  # set lazily (F.ones_mont at import order safety)

    def __init__(self):
        self.one = F.ones_mont(FR)

    @staticmethod
    def _shared(x):
        return hasattr(x, "ndim") and x.ndim >= 3

    @staticmethod
    def _lift(pub, like):
        import jax.numpy as jnp

        p0 = jnp.broadcast_to(pub, like.shape[1:])
        z = jnp.zeros_like(p0)
        return jnp.stack([p0, z, z])

    def mul(self, a, b):
        from ...parallel import mpc

        if self._shared(a) and self._shared(b):
            return mpc.mul(FR, a, b)
        return F.mul(FR, a, b)

    def add(self, a, b):
        if self._shared(a) != self._shared(b):
            if self._shared(a):
                b = self._lift(b, a)
            else:
                a = self._lift(a, b)
        return F.add(FR, a, b)

    def sub(self, a, b):
        if self._shared(a) != self._shared(b):
            if self._shared(a):
                b = self._lift(b, a)
            else:
                a = self._lift(a, b)
        return F.sub(FR, a, b)

    @staticmethod
    def const(c):
        return F.from_int(FR, c % MOD)


@dataclass(frozen=True)
class InstrSpec:
    name: str
    index_mode: str                     # "xy" | "sum" | "diff"
    subtable_chunks: tuple              # ((subtable_name, chunk_idx), ...)
    degree: int                         # max per-variable degree of combine
    combine: Callable                   # (ops, ev: dict[(sub, chunk)]) -> val

    def to_indices(self, x: int, y: int):
        if self.index_mode == "xy":
            return ST.interleave_chunks(x, y)
        if self.index_mode == "sum":
            return ST.chunks_of_index(x + y)
        if self.index_mode == "diff":
            return ST.chunks_of_index((x - y) + (1 << ST.WORD))
        raise ValueError(self.index_mode)


def _weights_8(ops, ev, sub):
    acc = None
    for i in range(C):
        term = ops.mul(ops.const(1 << (ST.BYTE * (C - 1 - i))), ev[(sub, i)])
        acc = term if acc is None else ops.add(acc, term)
    return acc


def _combine_and(ops, ev):
    return _weights_8(ops, ev, "and")


def _combine_or(ops, ev):
    return _weights_8(ops, ev, "or")


def _combine_xor(ops, ev):
    return _weights_8(ops, ev, "xor")


def _combine_add(ops, ev):
    return ops.add(
        ops.mul(ops.const(1 << ST.LOG_M), ev[("identity", 2)]),
        ev[("identity", 3)],
    )


def _combine_eq(ops, ev):
    acc = ev[("eq", 0)]
    for i in range(1, C):
        acc = ops.mul(acc, ev[("eq", i)])
    return acc


def _combine_ne(ops, ev):
    return ops.sub(ops.one, _combine_eq(ops, ev))


def _combine_ltu(ops, ev):
    acc = ev[("ltu", 0)]
    prefix_eq = ev[("eq", 0)]
    for i in range(1, C):
        acc = ops.add(acc, ops.mul(prefix_eq, ev[("ltu", i)]))
        if i < C - 1:
            prefix_eq = ops.mul(prefix_eq, ev[("eq", i)])
    return acc


def _combine_geu(ops, ev):
    return ops.sub(ops.one, _combine_ltu(ops, ev))


def _ltu_tail(ops, ev):
    """ltu over chunks 1..C-1 (the low 24 bits)."""
    acc = ev[("ltu", 1)]
    prefix_eq = ev[("eq", 1)]
    for i in range(2, C):
        acc = ops.add(acc, ops.mul(prefix_eq, ev[("ltu", i)]))
        if i < C - 1:
            prefix_eq = ops.mul(prefix_eq, ev[("eq", i)])
    return acc


def _combine_slt(ops, ev):
    sx = ev[("left_msb", 0)]
    sy = ev[("right_msb", 0)]
    # same-sign indicator: sx*sy + (1-sx)(1-sy)
    same = ops.add(
        ops.mul(sx, sy),
        ops.mul(ops.sub(ops.one, sx), ops.sub(ops.one, sy)),
    )
    lt_abs = ops.add(
        ev[("lt_abs", 0)], ops.mul(ev[("eq_abs", 0)], _ltu_tail(ops, ev))
    )
    return ops.add(
        ops.mul(sx, ops.sub(ops.one, sy)), ops.mul(same, lt_abs)
    )


def _combine_ge(ops, ev):
    return ops.sub(ops.one, _combine_slt(ops, ev))


def _all(sub):
    return tuple((sub, i) for i in range(C))


INSTRUCTIONS = {
    "AND": InstrSpec("AND", "xy", _all("and"), 1, _combine_and),
    "OR": InstrSpec("OR", "xy", _all("or"), 1, _combine_or),
    "XOR": InstrSpec("XOR", "xy", _all("xor"), 1, _combine_xor),
    "ADD": InstrSpec("ADD", "sum", (("identity", 2), ("identity", 3)), 1,
                     _combine_add),
    "SUB": InstrSpec("SUB", "diff", (("identity", 2), ("identity", 3)), 1,
                     _combine_add),
    "EQ": InstrSpec("EQ", "xy", _all("eq"), 4, _combine_eq),
    "NE": InstrSpec("NE", "xy", _all("eq"), 4, _combine_ne),
    "LTU": InstrSpec("LTU", "xy", _all("ltu") + _all("eq"), 4, _combine_ltu),
    "GEU": InstrSpec("GEU", "xy", _all("ltu") + _all("eq"), 4, _combine_geu),
    "SLT": InstrSpec(
        "SLT", "xy",
        (("left_msb", 0), ("right_msb", 0), ("lt_abs", 0), ("eq_abs", 0))
        + tuple(("ltu", i) for i in range(1, C))
        + tuple(("eq", i) for i in range(1, C)),
        6, _combine_slt),
    "GE": InstrSpec(
        "GE", "xy",
        (("left_msb", 0), ("right_msb", 0), ("lt_abs", 0), ("eq_abs", 0))
        + tuple(("ltu", i) for i in range(1, C))
        + tuple(("eq", i) for i in range(1, C)),
        6, _combine_ge),
}

# tracer op -> (lookup instruction, how y is sourced)
TRACER_TO_LOOKUP = {
    "ADD": "ADD", "ADDI": "ADD", "SUB": "SUB",
    "AND": "AND", "ANDI": "AND", "OR": "OR", "ORI": "OR",
    "XOR": "XOR", "XORI": "XOR",
    "BEQ": "EQ", "BNE": "NE", "BLTU": "LTU", "BGEU": "GEU",
    "BLT": "SLT", "BGE": "GE", "SLTU": "LTU", "SLT": "SLT",
    "SLTI": "SLT", "SLTIU": "LTU",
}


def memories_for(instr_names):
    """Sorted list of (subtable, chunk) memories used by the given set."""
    mems = set()
    for n in instr_names:
        mems.update(INSTRUCTIONS[n].subtable_chunks)
    return sorted(mems)
