"""RV32I(M) decoder, assembler and tracing emulator (host-side).

Maps the reference's jolt-tracer dependency and co-jolt's host layer
(co-jolt/src/host/mod.rs, jolt/trace/rv.rs — SURVEY.md §2.8 "Host /
tracer"): decodes RISC-V words, executes them, and records per-step operand
values + lookup outputs + memory ops — the witness source for the Lasso
instruction-lookup, bytecode and read/write-memory provers.

Host Python is the right tool here (the reference's tracer is host Rust):
tracing is sequential I/O-ish work off the proving hot path. The tiny
assembler lets tests build guests without a RISC-V toolchain; ELF ingestion
can layer on top later.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

MASK32 = 0xFFFFFFFF


def _sx(val: int, bits: int) -> int:
    """Sign-extend ``bits``-wide value to Python int."""
    val &= (1 << bits) - 1
    if val & (1 << (bits - 1)):
        val -= 1 << bits
    return val


@dataclass(frozen=True)
class Instr:
    op: str
    rd: int = 0
    rs1: int = 0
    rs2: int = 0
    imm: int = 0
    raw: int = 0
    address: int = 0


@dataclass
class TraceStep:
    instr: Instr
    pc: int
    rs1_val: int                # 32-bit operand x
    rs2_val: int                # 32-bit operand y (or imm for I-type lookups)
    rd_post: int                # value written to rd (0 if none)
    lookup_output: int          # the Lasso lookup result for this op
    mem_addr: Optional[int] = None
    mem_read: Optional[int] = None   # value read (loads) / pre-value (stores)
    mem_write: Optional[int] = None  # value written (stores)


R_FUNCTS = {
    (0b000, 0): "ADD", (0b000, 0x20): "SUB", (0b001, 0): "SLL",
    (0b010, 0): "SLT", (0b011, 0): "SLTU", (0b100, 0): "XOR",
    (0b101, 0): "SRL", (0b101, 0x20): "SRA", (0b110, 0): "OR",
    (0b111, 0): "AND",
    (0b000, 1): "MUL", (0b001, 1): "MULH", (0b010, 1): "MULHSU",
    (0b011, 1): "MULHU", (0b100, 1): "DIV", (0b101, 1): "DIVU",
    (0b110, 1): "REM", (0b111, 1): "REMU",
}
I_FUNCTS = {0b000: "ADDI", 0b010: "SLTI", 0b011: "SLTIU", 0b100: "XORI",
            0b110: "ORI", 0b111: "ANDI"}
LOAD_FUNCTS = {0b000: "LB", 0b001: "LH", 0b010: "LW", 0b100: "LBU", 0b101: "LHU"}
STORE_FUNCTS = {0b000: "SB", 0b001: "SH", 0b010: "SW"}
BRANCH_FUNCTS = {0b000: "BEQ", 0b001: "BNE", 0b100: "BLT", 0b101: "BGE",
                 0b110: "BLTU", 0b111: "BGEU"}


def decode(word: int, address: int = 0) -> Instr:
    opcode = word & 0x7F
    rd = (word >> 7) & 0x1F
    funct3 = (word >> 12) & 0x7
    rs1 = (word >> 15) & 0x1F
    rs2 = (word >> 20) & 0x1F
    funct7 = (word >> 25) & 0x7F

    if opcode == 0x33:  # R-type
        op = R_FUNCTS[(funct3, funct7)]
        return Instr(op, rd=rd, rs1=rs1, rs2=rs2, raw=word, address=address)
    if opcode == 0x13:  # I-type arith
        if funct3 == 0b001:
            return Instr("SLLI", rd=rd, rs1=rs1, imm=rs2, raw=word, address=address)
        if funct3 == 0b101:
            op = "SRAI" if funct7 == 0x20 else "SRLI"
            return Instr(op, rd=rd, rs1=rs1, imm=rs2, raw=word, address=address)
        return Instr(I_FUNCTS[funct3], rd=rd, rs1=rs1, imm=_sx(word >> 20, 12),
                     raw=word, address=address)
    if opcode == 0x03:  # loads
        return Instr(LOAD_FUNCTS[funct3], rd=rd, rs1=rs1,
                     imm=_sx(word >> 20, 12), raw=word, address=address)
    if opcode == 0x23:  # stores
        imm = _sx(((word >> 25) << 5) | rd, 12)
        return Instr(STORE_FUNCTS[funct3], rs1=rs1, rs2=rs2, imm=imm,
                     raw=word, address=address)
    if opcode == 0x63:  # branches
        imm = _sx(
            (((word >> 31) & 1) << 12) | (((word >> 7) & 1) << 11)
            | (((word >> 25) & 0x3F) << 5) | (((word >> 8) & 0xF) << 1),
            13,
        )
        return Instr(BRANCH_FUNCTS[funct3], rs1=rs1, rs2=rs2, imm=imm,
                     raw=word, address=address)
    if opcode == 0x37:
        return Instr("LUI", rd=rd, imm=word & 0xFFFFF000, raw=word, address=address)
    if opcode == 0x17:
        return Instr("AUIPC", rd=rd, imm=word & 0xFFFFF000, raw=word,
                     address=address)
    if opcode == 0x6F:
        imm = _sx(
            (((word >> 31) & 1) << 20) | (((word >> 12) & 0xFF) << 12)
            | (((word >> 20) & 1) << 11) | (((word >> 21) & 0x3FF) << 1),
            21,
        )
        return Instr("JAL", rd=rd, imm=imm, raw=word, address=address)
    if opcode == 0x67:
        return Instr("JALR", rd=rd, rs1=rs1, imm=_sx(word >> 20, 12), raw=word,
                     address=address)
    if opcode == 0x73 and word in (0x73, 0x100073):
        return Instr("ECALL" if word == 0x73 else "EBREAK", raw=word,
                     address=address)
    raise ValueError(f"cannot decode instruction word {word:#010x}")


# --- assembler (tests / guest construction without a RISC-V toolchain) ------

_R_ENC = {v: k for k, v in R_FUNCTS.items()}
_I_ENC = {v: k for k, v in I_FUNCTS.items()}
_L_ENC = {v: k for k, v in LOAD_FUNCTS.items()}
_S_ENC = {v: k for k, v in STORE_FUNCTS.items()}
_B_ENC = {v: k for k, v in BRANCH_FUNCTS.items()}


def asm(op: str, rd=0, rs1=0, rs2=0, imm=0) -> int:
    """Encode one instruction (inverse of decode; round-trip tested)."""
    op = op.upper()
    if op in _R_ENC:
        f3, f7 = _R_ENC[op]
        return (f7 << 25) | (rs2 << 20) | (rs1 << 15) | (f3 << 12) | (rd << 7) | 0x33
    if op in ("SLLI", "SRLI", "SRAI"):
        f3 = 0b001 if op == "SLLI" else 0b101
        f7 = 0x20 if op == "SRAI" else 0
        return (f7 << 25) | ((imm & 0x1F) << 20) | (rs1 << 15) | (f3 << 12) | (rd << 7) | 0x13
    if op in _I_ENC:
        return ((imm & 0xFFF) << 20) | (rs1 << 15) | (_I_ENC[op] << 12) | (rd << 7) | 0x13
    if op in _L_ENC:
        return ((imm & 0xFFF) << 20) | (rs1 << 15) | (_L_ENC[op] << 12) | (rd << 7) | 0x03
    if op in _S_ENC:
        i = imm & 0xFFF
        return ((i >> 5) << 25) | (rs2 << 20) | (rs1 << 15) | (_S_ENC[op] << 12) | ((i & 0x1F) << 7) | 0x23
    if op in _B_ENC:
        i = imm & 0x1FFF
        return ((((i >> 12) & 1) << 31) | (((i >> 5) & 0x3F) << 25)
                | (rs2 << 20) | (rs1 << 15) | (_B_ENC[op] << 12)
                | (((i >> 1) & 0xF) << 8) | (((i >> 11) & 1) << 7) | 0x63)
    if op == "LUI":
        return (imm & 0xFFFFF000) | (rd << 7) | 0x37
    if op == "AUIPC":
        return (imm & 0xFFFFF000) | (rd << 7) | 0x17
    if op == "JAL":
        i = imm & 0x1FFFFF
        return ((((i >> 20) & 1) << 31) | (((i >> 1) & 0x3FF) << 21)
                | (((i >> 11) & 1) << 20) | (((i >> 12) & 0xFF) << 12)
                | (rd << 7) | 0x6F)
    if op == "JALR":
        return ((imm & 0xFFF) << 20) | (rs1 << 15) | (rd << 7) | 0x67
    if op == "ECALL":
        return 0x73
    raise ValueError(f"cannot assemble {op}")


# --- emulator ---------------------------------------------------------------


def _lookup_output(op: str, x: int, y: int, pc: int = 0) -> int:
    """The value the Lasso lookup must produce for this instruction."""
    sx, sy = _sx(x, 32), _sx(y, 32)
    if op in ("ADD", "ADDI"):
        return (x + y) & MASK32
    if op == "SUB":
        return (x - y) & MASK32
    if op in ("XOR", "XORI"):
        return x ^ y
    if op in ("OR", "ORI"):
        return x | y
    if op in ("AND", "ANDI"):
        return x & y
    if op in ("SLL", "SLLI"):
        return (x << (y & 0x1F)) & MASK32
    if op in ("SRL", "SRLI"):
        return x >> (y & 0x1F)
    if op in ("SRA", "SRAI"):
        return (sx >> (y & 0x1F)) & MASK32
    if op in ("SLT", "SLTI"):
        return 1 if sx < sy else 0
    if op in ("SLTU", "SLTIU"):
        return 1 if x < y else 0
    if op == "BEQ":
        return 1 if x == y else 0
    if op == "BNE":
        return 1 if x != y else 0
    if op == "BLT":
        return 1 if sx < sy else 0
    if op == "BGE":
        return 1 if sx >= sy else 0
    if op == "BLTU":
        return 1 if x < y else 0
    if op == "BGEU":
        return 1 if x >= y else 0
    if op == "MUL":
        return (x * y) & MASK32
    if op == "MULHU":
        return ((x * y) >> 32) & MASK32
    if op == "MULH":
        return ((sx * sy) >> 32) & MASK32
    if op == "MULHSU":
        return ((sx * y) >> 32) & MASK32
    if op == "DIVU":
        return MASK32 if y == 0 else x // y
    if op == "DIV":
        if y == 0:
            return MASK32
        q = abs(sx) // abs(sy) if sy != 0 else 0
        return (-q if (sx < 0) != (sy < 0) else q) & MASK32
    if op == "REMU":
        return x if y == 0 else x % y
    if op == "REM":
        if y == 0:
            return x
        r = abs(sx) % abs(sy)
        return (-r if sx < 0 else r) & MASK32
    return 0


class Emulator:
    """Word-addressable RV32I(M) machine producing a Jolt-style trace."""

    def __init__(self, program, base: int = 0x8000_0000, memory=None,
                 max_steps: int = 1 << 20):
        self.program = {base + 4 * i: decode(w, base + 4 * i)
                        for i, w in enumerate(program)}
        self.base = base
        self.pc = base
        self.regs = [0] * 32
        self.memory = dict(memory or {})  # byte-addressed
        self.max_steps = max_steps
        self.trace: list[TraceStep] = []

    def _load(self, addr: int, nbytes: int) -> int:
        return sum(self.memory.get(addr + i, 0) << (8 * i) for i in range(nbytes))

    def _store(self, addr: int, value: int, nbytes: int):
        for i in range(nbytes):
            self.memory[addr + i] = (value >> (8 * i)) & 0xFF

    def run(self):
        steps = 0
        while self.pc in self.program:
            if steps >= self.max_steps:
                raise RuntimeError("max_steps exceeded")
            ins = self.program[self.pc]
            op = ins.op
            if op == "ECALL" or op == "EBREAK":
                break
            x = self.regs[ins.rs1]
            next_pc = self.pc + 4
            rd_post = 0
            mem_addr = mem_read = mem_write = None

            if op in R_FUNCTS.values():
                y = self.regs[ins.rs2]
                out = _lookup_output(op, x, y)
                rd_post = out
            elif op in ("ADDI", "SLTI", "SLTIU", "XORI", "ORI", "ANDI",
                        "SLLI", "SRLI", "SRAI"):
                y = ins.imm & MASK32
                out = _lookup_output(op, x, y)
                rd_post = out
            elif op in LOAD_FUNCTS.values():
                y = ins.imm & MASK32
                mem_addr = (x + ins.imm) & MASK32
                nbytes = {"LB": 1, "LBU": 1, "LH": 2, "LHU": 2, "LW": 4}[op]
                raw = self._load(mem_addr, nbytes)
                mem_read = raw
                if op in ("LB", "LH"):
                    out = _sx(raw, 8 * nbytes) & MASK32
                else:
                    out = raw
                rd_post = out
            elif op in STORE_FUNCTS.values():
                y = self.regs[ins.rs2]
                mem_addr = (x + ins.imm) & MASK32
                nbytes = {"SB": 1, "SH": 2, "SW": 4}[op]
                mem_read = self._load(mem_addr, nbytes)
                mem_write = y & ((1 << (8 * nbytes)) - 1)
                self._store(mem_addr, y, nbytes)
                out = mem_write
            elif op in BRANCH_FUNCTS.values():
                y = self.regs[ins.rs2]
                out = _lookup_output(op, x, y)
                if out:
                    next_pc = (self.pc + ins.imm) & MASK32
            elif op == "LUI":
                x, y = 0, ins.imm & MASK32
                out = y
                rd_post = out
            elif op == "AUIPC":
                x, y = self.pc, ins.imm & MASK32
                out = (self.pc + ins.imm) & MASK32
                rd_post = out
            elif op == "JAL":
                x, y = self.pc, ins.imm & MASK32
                out = (self.pc + 4) & MASK32
                rd_post = out
                next_pc = (self.pc + ins.imm) & MASK32
            elif op == "JALR":
                y = ins.imm & MASK32
                out = (self.pc + 4) & MASK32
                rd_post = out
                next_pc = (x + ins.imm) & MASK32 & ~1
            else:  # pragma: no cover
                raise ValueError(f"unhandled op {op}")

            if ins.rd != 0 and op not in STORE_FUNCTS.values() \
                    and op not in BRANCH_FUNCTS.values():
                self.regs[ins.rd] = rd_post
            self.trace.append(TraceStep(
                instr=ins, pc=ins.address, rs1_val=x, rs2_val=y,
                rd_post=rd_post, lookup_output=out,
                mem_addr=mem_addr, mem_read=mem_read, mem_write=mem_write,
            ))
            self.pc = next_pc
            steps += 1
        return self.trace
