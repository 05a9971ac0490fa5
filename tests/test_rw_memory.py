"""Offline memory checking: registers + RAM + bytecode from a real RV32I trace."""

import pytest

from co_zkvms_tpu.models.jolt import rv32i as rv
from co_zkvms_tpu.models.jolt import rw_memory as RW
from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import pst13

MOD = F.FR.modulus


@pytest.fixture(scope="module")
def srs():
    return pst13.setup_cached(8, seed=21)


def _program():
    return [
        rv.asm("LUI", rd=1, imm=0x10000000),
        rv.asm("ADDI", rd=2, rs1=0, imm=77),
        rv.asm("SW", rs1=1, rs2=2, imm=0),
        rv.asm("ADDI", rd=3, rs1=2, imm=1),
        rv.asm("SW", rs1=1, rs2=3, imm=4),
        rv.asm("LW", rd=4, rs1=1, imm=0),
        rv.asm("ADD", rd=5, rs1=4, rs2=3),
        rv.asm("ECALL"),
    ]


def test_memory_checking_e2e(srs):
    prog = _program()
    emu = rv.Emulator(prog)
    trace = emu.run()

    mem_bits = 6
    reg_ops = RW.register_ops_from_trace(trace)
    ram_ops = RW.ram_ops_from_trace(trace, ram_base=0x10000000, mem_bits=mem_bits)
    byte_ops = RW.bytecode_ops_from_trace(trace, prog, base=0x8000_0000)

    traces = [
        RW.MemoryTrace("regs", mem_bits, reg_ops, [0] * 32),
        RW.MemoryTrace("ram", mem_bits, ram_ops, [0] * (1 << mem_bits)),
        RW.MemoryTrace("bytecode", mem_bits, byte_ops,
                       prog + [0] * ((1 << mem_bits) - len(prog))),
    ]
    # align raw op counts before building (GKR batches are rectangular):
    # pad with no-op read-write-backs of address 0
    n_max = max(len(t.ops) for t in traces)
    aligned = []
    for t in traces:
        cur = t.init_vals[0] if t.init_vals else 0
        for a, _, vw in t.ops:
            if a == 0:
                cur = vw
        ops = list(t.ops) + [(0, cur, cur)] * (n_max - len(t.ops))
        aligned.append(RW.build_witness(
            RW.MemoryTrace(t.name, t.mem_bits, ops, t.init_vals)
        ))
    assert len({w.n for w in aligned}) == 1

    proof = RW.prove(aligned, srs)
    instances = [(t.name, t.mem_bits, t.init_vals) for t in traces]
    assert RW.verify(proof, instances, srs)

    # tampering with a read value must fail
    bad = aligned[0]._replace(
        v_read=F.from_int(F.FR, [1] * aligned[0].n)
    )
    bad_proof = RW.prove([bad] + aligned[1:], srs)
    assert not RW.verify(bad_proof, instances, srs)


def test_build_witness_rejects_bad_read():
    t = RW.MemoryTrace("m", 3, [(1, 5, 5)], [0] * 8)  # reads 5 but memory has 0
    with pytest.raises(AssertionError):
        RW.build_witness(t)
