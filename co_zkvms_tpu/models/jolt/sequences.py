"""Virtual instruction sequences: RV32IM ops expanded to lookup-step rows.

Maps the reference's virtual-sequence expansion (co-jolt
jolt/vm/jolt/mod.rs:156-221 flat-maps MULH/MULHSU/DIV/DIVU/REM/REMU and
byte/halfword loads/stores through ``virtual_sequence`` before building
bytecode rows; the virtual instruction set lives in
co-jolt/src/jolt/instruction/virtual_*.rs).  An op with no single Lasso
lookup becomes a short straight-line program of *virtual rows* — advice
lookups, validity asserts, moves, shifts — executed over an extended
64-register file (x0..x31 architectural + v0..v31 scratch, mirroring
jolt-core's virtual registers).

Every row of a sequence carries the SAME real pc (committed in the bc_pc
column); all but the last row set cf_virtual (the next fetched row must be
bc_addr+1 with unchanged pc), and only the first row sets cf_ventry — a
non-virtual predecessor must land on a ventry row whose pc equals its
computed next-pc, so control flow can neither skip validity asserts nor
enter a sequence mid-way (see models/jolt/uniform_spartan.py's next-pc
gates).

The sequences are NOT copies of jolt-core's: they are re-derived against
this framework's lookup table set with explicit soundness arguments
(docstrings below).  In particular signed DIV/REM runs the unsigned
division core on two's-complement magnitudes — the RISC-V overflow case
(x = -2^(w-1), y = -1) and the divide-by-zero convention (q = -1, r = x)
fall out without special-case rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from . import instructions as INS
from . import subtables as ST
from . import uniform_spartan as US

# virtual scratch registers (jolt-core uses 32 virtual registers as well)
N_REGS = 64


def v(i: int) -> int:
    """Virtual scratch register i (0..31) -> register-file index."""
    assert 0 <= i < 32
    return 32 + i


@dataclass(frozen=True)
class VStep:
    """One virtual row of a sequence (pre-flag form)."""

    op: Optional[str]           # lookup name in INS.INSTRUCTIONS, or None
    rd: int = 0
    rs1: int = 0
    rs2: int = 0
    imm: int = 0
    right_imm: bool = False     # y operand = imm (cf_right_imm)
    asserted: bool = False      # lookup output must equal 1 (cf_assert)
    mem: Optional[str] = None   # None | "load" | "store"
    advice: Optional[Callable] = None   # (x0, y0) -> int @ current ST.WORD


@dataclass(frozen=True)
class Row:
    """One bytecode row of the EXPANDED program (public; the verifier
    derives the identical list from the program words)."""

    op: Optional[str]           # lookup name or None (LUI/LW/SW/no-lookup)
    rs1: int
    rs2: int
    rd: int
    imm: int                    # signed host int; committed as u32
    pc: int                     # real instruction address (bc_pc column)
    flags: dict                 # CIRCUIT_FLAGS name -> 0/1
    advice: Optional[Callable] = None
    a_rs1: int = 0              # original op's operand registers — advice
    a_rs2: int = 0              # closures are evaluated on their values


# --- advice functions (evaluated at ST.WORD geometry in build_columns) ------


def _mask():
    return (1 << ST.WORD) - 1


def _mag(x):
    """Two's-complement magnitude of a WORD-bit value, as a WORD-bit uint
    (the magnitude of -2^(w-1) is 2^(w-1), same bit pattern)."""
    w = ST.WORD
    if (x >> (w - 1)) & 1:
        return (-x) & _mask()
    return x


def _adv_divu_q(x, y):
    return _mask() if y == 0 else x // y


def _adv_divu_r(x, y):
    return x if y == 0 else x % y


def _adv_div_uq(x, y):
    ax, ay = _mag(x), _mag(y)
    return _mask() if ay == 0 else ax // ay


def _adv_div_ur(x, y):
    ax, ay = _mag(x), _mag(y)
    return ax if ay == 0 else ax % ay


# --- sequence builders -------------------------------------------------------


def _unsigned_div_core(qr, rr, xr, yr, x_is_reg=True, adv_q=_adv_divu_q,
                       adv_r=_adv_divu_r):
    """Shared DIVU/REMU core: pins (q, r) with x = q*y + r over the
    INTEGERS and r < y (or y = 0, in which case q = 2^w - 1 and r = x).

    Soundness of the exact integer identity: MULHU(q,y) == 0 rules out
    high-word overflow of q*y, and ASSERT_LTE(lo, lo + r) rules out wrap of
    the final add (r < 2^w, so a wrapped sum is strictly below lo) — without
    the LTE an adversary could pick q' with q'*y mod 2^w = x - r' for a
    different (q', r'), e.g. y=2: q' = q + 2^(w-1).
    ``xr``/``yr``: registers holding the dividend / divisor."""
    LO, HI, SUM = v(6), v(7), v(8)
    return [
        VStep("ADVICE", rd=qr, advice=adv_q),
        VStep("ADVICE", rd=rr, advice=adv_r),
        # r < y or y == 0   (virtual_assert_valid_unsigned_remainder.rs)
        VStep("ASSERT_VALID_UNSIGNED_REMAINDER", rs1=rr, rs2=yr,
              asserted=True),
        # y != 0 or q == 2^w - 1   (virtual_assert_valid_div0.rs)
        VStep("ASSERT_VALID_DIV0", rs1=yr, rs2=qr, asserted=True),
        VStep("MULU", rd=LO, rs1=qr, rs2=yr),
        VStep("MULHU", rd=HI, rs1=qr, rs2=yr),
        VStep("EQ", rs1=HI, rs2=0, asserted=True),          # q*y < 2^w
        VStep("ADD", rd=SUM, rs1=LO, rs2=rr),
        VStep("ASSERT_LTE", rs1=LO, rs2=SUM, asserted=True),  # no add wrap
        VStep("EQ", rs1=SUM, rs2=xr, asserted=True),        # q*y + r = x
    ]


def seq_divu(ins, want_rem=False):
    Q, R = v(0), v(1)
    steps = _unsigned_div_core(Q, R, ins.rs1, ins.rs2)
    steps.append(VStep("MOVE", rd=ins.rd, rs1=R if want_rem else Q))
    return steps


def seq_remu(ins):
    return seq_divu(ins, want_rem=True)


def _abs_steps(src, sgn, out):
    """sgn <- MOVSIGN(src) (all-ones iff negative); out <- |src| via the
    conditional-negation identity (a XOR m) - m for the all-ones/zero mask."""
    return [
        VStep("MOVSIGN", rd=sgn, rs1=src),
        VStep("XOR", rd=out, rs1=src, rs2=sgn),
        VStep("SUB", rd=out, rs1=out, rs2=sgn),
    ]


def seq_div(ins, want_rem=False):
    """Signed DIV/REM via the unsigned core on magnitudes.

    q = sign-corrected uq where uq = |x| / |y|; the correction mask is
    (sign(x) XOR sign(y)) AND (y != 0): RISC-V's y = 0 convention
    (q = -1 = all-ones, r = x) then falls out because DIV0 forces
    uq = all-ones and the mask is zero; the signed-overflow case
    (x = -2^(w-1), y = -1) also falls out: uq = 2^(w-1) with equal signs is
    returned as-is, the two's-complement encoding of -2^(w-1).
    r carries the sign of the dividend (RISC-V REM convention)."""
    SX, SY, AX, AY, UQ, UR = v(0), v(1), v(2), v(3), v(4), v(5)
    SXY, NZ, NZM, QM, T = v(9), v(10), v(11), v(12), v(13)
    steps = _abs_steps(ins.rs1, SX, AX) + _abs_steps(ins.rs2, SY, AY)
    steps += _unsigned_div_core(UQ, UR, AX, AY,
                                adv_q=_adv_div_uq, adv_r=_adv_div_ur)
    if want_rem:
        steps += [
            VStep("XOR", rd=T, rs1=UR, rs2=SX),
            VStep("SUB", rd=ins.rd, rs1=T, rs2=SX),
        ]
    else:
        steps += [
            VStep("XOR", rd=SXY, rs1=SX, rs2=SY),
            VStep("NE", rd=NZ, rs1=ins.rs2, rs2=0),      # y != 0 (0/1)
            VStep("SUB", rd=NZM, rs1=0, rs2=NZ),         # 0/all-ones mask
            VStep("AND", rd=QM, rs1=SXY, rs2=NZM),
            VStep("XOR", rd=T, rs1=UQ, rs2=QM),
            VStep("SUB", rd=ins.rd, rs1=T, rs2=QM),
        ]
    return steps


def seq_rem(ins):
    return seq_div(ins, want_rem=True)


def seq_mulh(ins):
    """High word of the signed product: MULH(x,y) = MULHU(x,y) - [x<0]*y
    - [y<0]*x (mod 2^w), from sx(x)*sx(y) = x*y - 2^w([x<0]y + [y<0]x)
    + 2^(2w)[..] — subtracting multiples of 2^w shifts only the high word."""
    SX, SY, HI, T1, T2, T3 = v(0), v(1), v(2), v(3), v(4), v(5)
    return [
        VStep("MOVSIGN", rd=SX, rs1=ins.rs1),
        VStep("MOVSIGN", rd=SY, rs1=ins.rs2),
        VStep("MULHU", rd=HI, rs1=ins.rs1, rs2=ins.rs2),
        VStep("AND", rd=T1, rs1=ins.rs2, rs2=SX),        # [x<0] ? y : 0
        VStep("AND", rd=T2, rs1=ins.rs1, rs2=SY),        # [y<0] ? x : 0
        VStep("SUB", rd=T3, rs1=HI, rs2=T1),
        VStep("SUB", rd=ins.rd, rs1=T3, rs2=T2),
    ]


def seq_mulhsu(ins):
    """MULHSU (x signed, y unsigned): MULHU(x,y) - [x<0]*y (mod 2^w)."""
    SX, HI, T1 = v(0), v(1), v(2)
    return [
        VStep("MOVSIGN", rd=SX, rs1=ins.rs1),
        VStep("MULHU", rd=HI, rs1=ins.rs1, rs2=ins.rs2),
        VStep("AND", rd=T1, rs1=ins.rs2, rs2=SX),
        VStep("SUB", rd=ins.rd, rs1=HI, rs2=T1),
    ]


def _addr_steps(ins, halfword=False):
    """Common load/store address decomposition (requires WORD == 32: RAM is
    word-addressed, sub-word access = aligned LW + shift/mask):
    A = rs1 + imm; S = A & 3; O = 8*S; AL = A ^ S (the aligned word)."""
    A, S, O, AL = v(20), v(21), v(22), v(23)
    steps = [
        VStep("ADD", rd=A, rs1=ins.rs1, imm=ins.imm, right_imm=True),
        VStep("AND", rd=S, rs1=A, imm=3, right_imm=True),
        VStep("SLL", rd=O, rs1=S, imm=3, right_imm=True),
        VStep("XOR", rd=AL, rs1=A, rs2=S),
    ]
    if halfword:
        steps.insert(1, VStep("ASSERT_HALFWORD_ALIGNMENT", rs1=A, imm=0,
                              right_imm=True, asserted=True))
    return steps, A, S, O, AL


def _seq_load(ins, nbits, signed):
    assert ST.WORD == 32, "sub-word loads/stores require WORD=32 geometry"
    steps, A, S, O, AL = _addr_steps(ins, halfword=(nbits == 16))
    W, SH, B = v(24), v(25), v(26)
    m = (1 << nbits) - 1
    steps += [
        VStep(None, rd=W, rs1=AL, imm=0, right_imm=True, mem="load"),
        VStep("SRL", rd=SH, rs1=W, rs2=O),
    ]
    if signed:
        steps += [
            VStep("AND", rd=B, rs1=SH, imm=m, right_imm=True),
            VStep(f"SEXT{nbits}", rd=ins.rd, rs1=B),
        ]
    else:
        steps += [VStep("AND", rd=ins.rd, rs1=SH, imm=m, right_imm=True)]
    return steps


def seq_lb(ins):
    return _seq_load(ins, 8, True)


def seq_lbu(ins):
    return _seq_load(ins, 8, False)


def seq_lh(ins):
    return _seq_load(ins, 16, True)


def seq_lhu(ins):
    return _seq_load(ins, 16, False)


def _seq_store(ins, nbits):
    """Read-modify-write a byte/halfword inside the aligned word."""
    assert ST.WORD == 32, "sub-word loads/stores require WORD=32 geometry"
    steps, A, S, O, AL = _addr_steps(ins, halfword=(nbits == 16))
    W, FF, MK, ONES, KM, K, B, BS, NW = (v(24), v(25), v(26), v(27), v(28),
                                         v(29), v(30), v(31), v(19))
    m = (1 << nbits) - 1
    steps += [
        VStep(None, rd=W, rs1=AL, imm=0, right_imm=True, mem="load"),
        VStep("ADD", rd=FF, rs1=0, imm=m, right_imm=True),
        VStep("SLL", rd=MK, rs1=FF, rs2=O),
        VStep("SUB", rd=ONES, rs1=0, imm=1, right_imm=True),  # all-ones
        VStep("XOR", rd=KM, rs1=MK, rs2=ONES),                # keep mask
        VStep("AND", rd=K, rs1=W, rs2=KM),
        VStep("AND", rd=B, rs1=ins.rs2, imm=m, right_imm=True),
        VStep("SLL", rd=BS, rs1=B, rs2=O),
        VStep("OR", rd=NW, rs1=K, rs2=BS),
        VStep(None, rs1=AL, rs2=NW, imm=0, right_imm=True, mem="store"),
    ]
    return steps


def seq_sb(ins):
    return _seq_store(ins, 8)


def seq_sh(ins):
    return _seq_store(ins, 16)


SEQUENCES = {
    "MULH": seq_mulh,
    "MULHSU": seq_mulhsu,
    "DIV": seq_div,
    "DIVU": seq_divu,
    "REM": seq_rem,
    "REMU": seq_remu,
    "LB": seq_lb,
    "LBU": seq_lbu,
    "LH": seq_lh,
    "LHU": seq_lhu,
    "SB": seq_sb,
    "SH": seq_sh,
}


# --- expansion ---------------------------------------------------------------


def _vstep_flags(vs: VStep, is_last: bool) -> dict:
    f = {k: 0 for k in US.CIRCUIT_FLAGS}
    f["cf_right_imm"] = int(vs.right_imm)
    f["cf_load"] = int(vs.mem == "load")
    f["cf_store"] = int(vs.mem == "store")
    f["cf_assert"] = int(vs.asserted)
    if vs.op is not None and INS.INSTRUCTIONS[vs.op].index_mode == "xy":
        f["cf_concat"] = 1
    f["cf_virtual"] = 0 if is_last else 1
    f["cf_imm_neg"] = int(vs.imm < 0)
    f["cf_rdnz"] = int(vs.rd != 0)
    f["cf_wlr"] = int(vs.op is not None and vs.rd != 0 and not vs.asserted
                      and vs.mem is None)
    return f


def expand_instr(ins) -> list[Row]:
    """Expand one decoded instruction into its public bytecode rows."""
    if ins.op in SEQUENCES:
        steps = SEQUENCES[ins.op](ins)
        rows = []
        for k, vs in enumerate(steps):
            flags = _vstep_flags(vs, k == len(steps) - 1)
            flags["cf_ventry"] = int(k == 0)
            rows.append(Row(op=vs.op, rs1=vs.rs1, rs2=vs.rs2, rd=vs.rd,
                            imm=vs.imm, pc=ins.address, flags=flags,
                            advice=vs.advice, a_rs1=ins.rs1, a_rs2=ins.rs2))
        return rows
    # plain single-row op
    if ins.op in ("ECALL", "EBREAK"):
        f = {k: 0 for k in US.CIRCUIT_FLAGS}
        return [Row(op=None, rs1=0, rs2=0, rd=0, imm=0, pc=ins.address,
                    flags=f)]
    flags = US.op_flags(ins.op, imm=ins.imm, rd=ins.rd)
    flags["cf_ventry"] = 1
    lk = None if ins.op == "LUI" else INS.TRACER_TO_LOOKUP.get(ins.op)
    if lk is None and ins.op not in ("LUI", "LW", "SW"):
        raise NotImplementedError(f"op {ins.op} has no lookup or sequence")
    return [Row(op=lk, rs1=ins.rs1, rs2=ins.rs2, rd=ins.rd, imm=ins.imm,
                pc=ins.address, flags=flags)]


def expand_program(program_words, code_base: int):
    """Expand the public program image.

    Returns (rows, pc2span): ``rows`` is the flat list of expanded rows (the
    bytecode image is [zero row] + rows, so bc_addr of rows[i] is i+1);
    ``pc2span`` maps each real pc to (first_bc_addr, row_count)."""
    from . import rv32i as rv

    rows = []
    pc2span = {}
    for i, w in enumerate(program_words):
        pc = code_base + 4 * i
        ins = rv.decode(w, pc)
        expanded = expand_instr(ins)
        pc2span[pc] = (len(rows) + 1, len(expanded))
        rows.extend(expanded)
    return rows, pc2span
