"""Instruction-set conformance: collation(subtable lookups) == lookup_entry.

The Lasso soundness contract per instruction (jolt/instruction/*.rs): for any
operands, combining the per-chunk subtable values with the instruction's
collation polynomial must reproduce the instruction's output. Checked host-side
for every instruction in the set at LOG_M=8 geometry (WORD=16) — the smallest
geometry where shift semantics are well-formed (y % WORD must fit the y-half).
"""

import random

import pytest

from co_zkvms_tpu.models.jolt import instructions as INS
from co_zkvms_tpu.models.jolt import subtables as ST


@pytest.fixture(autouse=True, scope="module")
def geometry():
    ST.set_config(8)   # C=4, BYTE=4, WORD=16
    yield
    ST.set_config(16)


TWO_OPERAND = {
    "ADD", "SUB", "AND", "OR", "XOR", "EQ", "NE", "LTU", "GEU", "SLT", "GE",
    "SLL", "SRL", "SRA", "MUL", "MULU", "MULHU", "ASSERT_LTE",
    "ASSERT_VALID_UNSIGNED_REMAINDER", "ASSERT_VALID_SIGNED_REMAINDER",
    "ASSERT_VALID_DIV0", "ASSERT_HALFWORD_ALIGNMENT",
}
ONE_OPERAND = {"MOVSIGN", "MOVE", "ADVICE", "POW2", "SRA_PADDING",
               "SEXT8", "SEXT16"}


def collate_host(name, x, y):
    spec = INS.INSTRUCTIONS[name]
    idxs = spec.to_indices(x, y)
    ev = {}
    for sub, chunk in spec.subtable_chunks:
        table = ST.materialize_ints(sub)
        ev[(sub, chunk)] = table[idxs[chunk]]
    return spec.combine(INS.HostOps(), ev) % INS.MOD


def interesting_operands(rng, w):
    mask = (1 << w) - 1
    vals = [0, 1, 2, mask, mask - 1, 1 << (w - 1), (1 << (w - 1)) - 1,
            (1 << (w - 1)) + 1, 0xFF, 0x100]
    vals += [rng.randrange(1 << w) for _ in range(12)]
    return [v & mask for v in vals]


def test_instruction_set_is_complete():
    assert set(INS.INSTRUCTIONS) == TWO_OPERAND | ONE_OPERAND
    # 29 lookup instructions >= the reference's 27 (rv32i_vm.rs:41-70;
    # SEXT8/SEXT16 are ours, for the byte/halfword load sequences)
    assert len(INS.INSTRUCTIONS) >= 27


@pytest.mark.parametrize("name", sorted(TWO_OPERAND))
def test_two_operand_collation(name, rng):
    w = ST.WORD
    for x in interesting_operands(rng, w):
        for y in interesting_operands(rng, w)[:8]:
            want = INS.lookup_entry(name, x, y)
            got = collate_host(name, x, y)
            assert got == want, (name, x, y, got, want)


@pytest.mark.parametrize("name", sorted(ONE_OPERAND))
def test_one_operand_collation(name, rng):
    w = ST.WORD
    for x in interesting_operands(rng, w):
        want = INS.lookup_entry(name, x, 0)
        got = collate_host(name, x, 0)
        assert got == want, (name, x, got, want)


def test_degrees_match_structure():
    """Collation degree bound: combine uses at most `degree` chained muls."""
    for name, spec in INS.INSTRUCTIONS.items():
        assert spec.degree >= 1
        assert spec.degree <= 2 * ST.C + 2


def test_monomial_expansion_matches_combine(rng):
    """Symbolic monomial expansion == direct host combine on random reads,
    and the largest monomial respects the declared degree bound."""
    for name, spec in INS.INSTRUCTIONS.items():
        monos = INS.monomials(name)
        assert max((len(m) for _, m in monos), default=0) <= spec.degree, name
        ev = {mc: rng.randrange(INS.MOD) for mc in spec.subtable_chunks}
        direct = spec.combine(INS.HostOps(), ev) % INS.MOD
        expanded = 0
        for coeff, mems in monos:
            t = coeff
            for m in mems:
                t = t * ev[m] % INS.MOD
            expanded = (expanded + t) % INS.MOD
        assert expanded == direct, name


def test_monomial_table_layout():
    names = ("ADD", "SLT", "SLL")
    mems = tuple(INS.memories_for(names))
    tables = INS.monomial_table(names, mems)
    one_slot = len(names) + len(mems)
    total = 0
    for sel, coeffs in tables:
        assert sel.shape[0] == len(coeffs)
        assert (sel[:, 0] < len(names)).all()      # flag slots
        assert (sel[:, 1:] >= len(names)).all()    # factor slots (mem or ONE)
        assert (sel <= one_slot).all()
        total += len(coeffs)
    assert total == sum(len(INS.monomials(n)) for n in names)
