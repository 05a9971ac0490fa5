"""RV32I decoder/assembler round-trip + emulator correctness."""

import random

from co_zkvms_tpu.models.jolt import rv32i as rv


def test_asm_decode_roundtrip(rng):
    cases = [
        ("ADD", dict(rd=3, rs1=1, rs2=2)),
        ("SUB", dict(rd=5, rs1=7, rs2=9)),
        ("SLT", dict(rd=1, rs1=2, rs2=3)),
        ("ADDI", dict(rd=4, rs1=4, imm=-17)),
        ("ANDI", dict(rd=2, rs1=3, imm=0x7F)),
        ("SLLI", dict(rd=1, rs1=1, imm=5)),
        ("SRAI", dict(rd=1, rs1=1, imm=31)),
        ("LW", dict(rd=6, rs1=2, imm=8)),
        ("SW", dict(rs1=2, rs2=6, imm=-4)),
        ("BEQ", dict(rs1=1, rs2=2, imm=16)),
        ("BLT", dict(rs1=3, rs2=4, imm=-8)),
        ("LUI", dict(rd=7, imm=0xABCDE000)),
        ("AUIPC", dict(rd=7, imm=0x1000)),
        ("JAL", dict(rd=1, imm=2048)),
        ("JALR", dict(rd=1, rs1=5, imm=12)),
        ("MUL", dict(rd=3, rs1=1, rs2=2)),
        ("DIVU", dict(rd=3, rs1=1, rs2=2)),
    ]
    for op, kw in cases:
        word = rv.asm(op, **kw)
        ins = rv.decode(word)
        assert ins.op == op, (op, ins)
        for k, v in kw.items():
            got = getattr(ins, k)
            if k == "imm" and op in ("LUI", "AUIPC"):
                v &= 0xFFFFF000
            elif k == "imm":
                v = rv._sx(v, 32) if v >= 0 else v
            assert got == v or (k == "imm" and rv._sx(got, 32) == v), (op, k, got, v)


def fib_program(n):
    """Compute fib(n) into x10 using a loop."""
    return [
        rv.asm("ADDI", rd=1, rs1=0, imm=0),    # a = 0
        rv.asm("ADDI", rd=2, rs1=0, imm=1),    # b = 1
        rv.asm("ADDI", rd=3, rs1=0, imm=n),    # i = n
        # loop:
        rv.asm("BEQ", rs1=3, rs2=0, imm=24),   # if i==0 -> done (+6 instrs)
        rv.asm("ADD", rd=4, rs1=1, rs2=2),     # t = a+b
        rv.asm("ADD", rd=1, rs1=2, rs2=0),     # a = b
        rv.asm("ADD", rd=2, rs1=4, rs2=0),     # b = t
        rv.asm("ADDI", rd=3, rs1=3, imm=-1),   # i -= 1
        rv.asm("JAL", rd=0, imm=-20),          # -> loop
        # done:
        rv.asm("ADD", rd=10, rs1=1, rs2=0),    # x10 = a
        rv.asm("ECALL"),
    ]


def test_emulator_fib():
    emu = rv.Emulator(fib_program(10))
    emu.run()
    assert emu.regs[10] == 55
    assert len(emu.trace) > 30


def test_emulator_memory_and_shifts():
    prog = [
        rv.asm("LUI", rd=1, imm=0x10000000),       # base addr
        rv.asm("ADDI", rd=2, rs1=0, imm=1234),
        rv.asm("SW", rs1=1, rs2=2, imm=0),
        rv.asm("LW", rd=3, rs1=1, imm=0),
        rv.asm("SLLI", rd=4, rs1=3, imm=4),
        rv.asm("SRAI", rd=5, rs1=4, imm=2),
        rv.asm("XOR", rd=6, rs1=4, rs2=5),
        rv.asm("ECALL"),
    ]
    emu = rv.Emulator(prog)
    trace = emu.run()
    assert emu.regs[3] == 1234
    assert emu.regs[4] == 1234 << 4
    assert emu.regs[5] == (1234 << 4) >> 2
    assert emu.regs[6] == (1234 << 4) ^ ((1234 << 4) >> 2)
    # trace contains the store with pre/post values
    sw = [t for t in trace if t.instr.op == "SW"][0]
    assert sw.mem_write == 1234 and sw.mem_read == 0


def test_lookup_outputs_signed(rng):
    for _ in range(200):
        x = rng.randrange(1 << 32)
        y = rng.randrange(1 << 32)
        assert rv._lookup_output("ADD", x, y) == (x + y) % (1 << 32)
        assert rv._lookup_output("SUB", x, y) == (x - y) % (1 << 32)
        assert rv._lookup_output("SLT", x, y) == (
            1 if rv._sx(x, 32) < rv._sx(y, 32) else 0
        )
        assert rv._lookup_output("SRA", x, y) == (
            (rv._sx(x, 32) >> (y & 31)) & 0xFFFFFFFF
        )
        if y:
            assert rv._lookup_output("DIVU", x, y) == x // y
            assert rv._lookup_output("REMU", x, y) == x % y
