"""Uniform Spartan over Jolt step constraints — the cross-subsystem glue.

Maps co-jolt's R1CS layer (SURVEY.md §2.8: r1cs/constraints.rs:37 uniform +
cross-step constraint set, r1cs/inputs.rs:34,209 input indexing,
r1cs/spartan/worker.rs:62-273 outer/inner/shift sumchecks): one small R1CS
block, repeated per trace step, whose variables are per-step evaluations of
the SAME committed columns the other Jolt subsystems (Lasso, register/RAM/
bytecode memory checking) fingerprint.  This is what ties the lookup
operands to the register file, the pc to the bytecode, and step t to t+1 —
without it the subsystem proofs are mutually unlinked.

TPU-first re-design vs the reference:

- The constraint block is a dense K x I integer matrix triple (A, B, C) over
  named inputs; Az/Bz/Cz are materialized as [K_pad * T] MLE tables
  (constraint-major: index = k*T + t) and the OUTER zerocheck
  ``0 = sum eq * (Az*Bz - Cz)`` runs on the generic sumcheck engine with one
  tiny degree-3 comb kernel — fixed shape, no per-instruction-set XLA graphs.
- The reference's INNER sumcheck (worker.rs:175-227) collapses: after the
  outer sumcheck binds (r_t, r_k), the claim is
  ``Az(r) = sum_i Abar_i(r_k) * z_i(r_t)``, and because the uniform matrix is
  small and PUBLIC the verifier computes Abar_i(r_k) = sum_k eq(r_k,k)A[k,i]
  directly in O(K*I) host work; the z_i(r_t) are opening claims routed to the
  batched opening accumulator.  One fewer protocol phase, same soundness.
- Cross-step constraints (pc progression, virtual-sequence contiguity —
  constraints.rs:232-259 OffsetEqConstraint) reference the SHIFTED column
  bc_addr_next[t] = bc_addr[t+1]; its evaluation at r_t is proven by the
  SHIFT sumcheck  v = sum_t eqplus1(r_t, t) * bc_addr(t)  whose kernel
  eqplus1(x, y) = MLE of [y == x+1] has a closed form the verifier evaluates
  in O(nv^2) (maps jolt-core's EqPlusOnePolynomial used by worker.rs:229-269).

Imm convention: bc_imm is the two's-complement u32 immediate; the extra
circuit flag cf_imm_neg (pinned by the public bytecode via bitflags packing)
supplies the sign so branch targets / memory addresses use
``imm_signed = bc_imm - 2^32 * cf_imm_neg`` as an affine expression.

Chunk-range soundness: operand chunk columns chx_i/chy_i are range-checked
(< 2^BYTE) by dedicated range memories in the Jolt memory checker (address
2^BYTE * chx_i must appear in an init multiset over [0, M)); with chunks
ranged, the per-chunk dim constraints pin the operand decomposition uniquely
(see models/jolt/jolt.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ...ops import field as F
from ...ops import poly as P
from ...ops import sumcheck as SC
from ...ops import transcript as T
from ...ops.field import FR
from . import instructions as INS
from . import subtables as ST

MOD = FR.modulus

# circuit flags, packed into bc_bitflags bits 0..N_CF-1 (instruction flags
# occupy bits N_CF..). All are pinned by the public program image.
CIRCUIT_FLAGS = (
    "cf_left_pc",       # lookup left operand is the pc (JAL/AUIPC)
    "cf_right_imm",     # lookup right operand is the immediate
    "cf_load",          # LW
    "cf_store",         # SW
    "cf_jump",          # JAL/JALR
    "cf_branch",        # conditional branch
    "cf_lui",           # LUI: rd <- imm, no lookup
    "cf_assert",        # virtual assert: lookup output must be 1
    "cf_concat",        # lookup index mode "xy" (interleaved chunks)
    "cf_virtual",       # virtual-sequence step (no pc update, contiguity)
    "cf_imm_neg",       # decoded immediate is negative
    "cf_rdnz",          # rd field is nonzero (a real destination register)
    "cf_wlr",           # rd <- lookup output (WriteLookupOutputToRD)
    "cf_ventry",        # first row of an op (virtual-sequence entry point)
)
N_CF = len(CIRCUIT_FLAGS)

_R_ARITH = {"ADD", "SUB", "SLL", "SLT", "SLTU", "XOR", "SRL", "SRA", "OR",
            "AND", "MUL", "MULH", "MULHSU", "MULHU"}
_I_ARITH = {"ADDI", "SLTI", "SLTIU", "XORI", "ORI", "ANDI", "SLLI", "SRLI",
            "SRAI"}
_BRANCH = {"BEQ", "BNE", "BLT", "BGE", "BLTU", "BGEU"}


def op_flags(op: str, imm: int = 0, rd: int = 0) -> dict:
    """Circuit-flag assignment for one decoded op (host-side; the verifier
    derives the same values from the public program image)."""
    f = {k: 0 for k in CIRCUIT_FLAGS}
    if op in ("JAL", "AUIPC"):
        f["cf_left_pc"] = 1
    if op in _I_ARITH or op in ("JAL", "JALR", "AUIPC", "LW", "SW"):
        f["cf_right_imm"] = 1
    if op == "LW":
        f["cf_load"] = 1
    if op == "SW":
        f["cf_store"] = 1
    if op in ("JAL", "JALR"):
        f["cf_jump"] = 1
    if op in _BRANCH:
        f["cf_branch"] = 1
    if op == "LUI":
        f["cf_lui"] = 1
    lk = INS.TRACER_TO_LOOKUP.get(op)
    if lk is not None and INS.INSTRUCTIONS[lk].index_mode == "xy":
        f["cf_concat"] = 1
    if imm < 0:
        f["cf_imm_neg"] = 1
    if rd != 0:
        f["cf_rdnz"] = 1
    f["cf_wlr"] = writes_lookup_to_rd(op)
    f["cf_ventry"] = 1          # plain ops are single-row sequences
    return f


def writes_lookup_to_rd(op: str) -> int:
    """rd <- lookup output (R/I arithmetic + AUIPC)."""
    return int(op in _R_ARITH or op in _I_ARITH or op == "AUIPC")


# --- linear combinations & constraint system --------------------------------
# An LC is {input_name: int_coeff}; the key "one" is the constant term.


def _lc(*pairs):
    out = {}
    for name, c in pairs:
        out[name] = (out.get(name, 0) + c) % MOD
    return {k: v for k, v in out.items() if v}


def _lc_sub(a, b):
    out = dict(a)
    for k, v in b.items():
        out[k] = (out.get(k, 0) - v) % MOD
    return {k: v for k, v in out.items() if v}


class AuxDef(NamedTuple):
    name: str
    kind: str           # "prod" | "ifelse"
    a: dict             # prod: factor / ifelse: boolean condition
    b: dict             # prod: factor / ifelse: then-branch
    c: dict             # ifelse: else-branch (unused for prod)


class ConstraintSystem(NamedTuple):
    inputs: tuple       # ordered input names; [0] == "one" (virtual)
    committed: tuple    # the subset of inputs with committed columns
    aux_defs: tuple     # AuxDef evaluation order
    rows: tuple         # ((A_lc, B_lc, C_lc), ...)
    k_pad: int
    instr_names: tuple


def _pack_weights(n, step):
    """[step^(n-1), ..., step, 1] — big-endian positional weights."""
    return [1 << (step * (n - 1 - i)) for i in range(n)]


def build(instr_names, code_base: int, ram_base: int) -> ConstraintSystem:
    """Construct the uniform constraint block for the given instruction set.

    Mirrors JoltRV32IMConstraints::uniform_constraints +
    cross_step_constraints (r1cs/constraints.rs:40-259), adapted to this
    framework's instruction/index-mode layer.
    """
    instr_names = tuple(instr_names)
    c, b, logm, word = ST.C, ST.BYTE, ST.LOG_M, ST.WORD
    two32 = 1 << 32

    inputs = ["one",
              "bc_addr", "bc_bitflags", "bc_rs1", "bc_rs2", "bc_rd", "bc_imm",
              "bc_pc",
              "rs1_val", "rs2_val", "rd_pre", "rd_val",
              "ram_addr", "ram_read", "ram_write",
              "lookup_out"]
    inputs += [f"dim_{i}" for i in range(c)]
    inputs += [f"chx_{i}" for i in range(c)]
    inputs += [f"chy_{i}" for i in range(c)]
    inputs += [f"flag_{nm}" for nm in instr_names]
    inputs += list(CIRCUIT_FLAGS)

    aux_defs = []
    rows = []

    def constrain(a, bb, cc):
        rows.append((dict(a), dict(bb), dict(cc)))

    def binary(name):
        v = _lc((name, 1))
        constrain(v, _lc_sub(v, _lc(("one", 1))), {})

    def eq_cond(cond, lhs, rhs):
        constrain(cond, _lc_sub(lhs, rhs), {})

    def aux_prod(name, a, bb):
        aux_defs.append(AuxDef(name, "prod", dict(a), dict(bb), {}))
        inputs.append(name)
        constrain(a, bb, _lc((name, 1)))

    def aux_ifelse(name, cond, then, els):
        aux_defs.append(AuxDef(name, "ifelse", dict(cond), dict(then),
                               dict(els)))
        inputs.append(name)
        # name - els == cond * (then - els)
        constrain(cond, _lc_sub(then, els),
                  _lc_sub(_lc((name, 1)), els))

    # with virtual sequences the pc is no longer affine in the row index:
    # it is its own committed column, multiset-checked as part of the
    # bytecode tuple (the reference's BytecodeRow carries `address` the
    # same way, jolt/vm/bytecode/mod.rs)
    real_pc = _lc(("bc_pc", 1))
    imm_signed = _lc(("bc_imm", 1), ("cf_imm_neg", -two32))

    # 1. booleanity of every flag
    for nm in instr_names:
        binary(f"flag_{nm}")
    for cf in CIRCUIT_FLAGS:
        binary(cf)

    # 2. bitflags packing pins flags to the bytecode-checked word
    pack = _lc(*[(cf, 1 << k) for k, cf in enumerate(CIRCUIT_FLAGS)],
               *[(f"flag_{nm}", 1 << (N_CF + j))
                 for j, nm in enumerate(instr_names)])
    constrain(_lc(("one", 1)), _lc_sub(pack, _lc(("bc_bitflags", 1))), {})

    # 3. operand selection (allocate_if_else, constraints.rs:59-71)
    aux_ifelse("ax_x", _lc(("cf_left_pc", 1)), real_pc, _lc(("rs1_val", 1)))
    aux_ifelse("ax_y", _lc(("cf_right_imm", 1)), _lc(("bc_imm", 1)),
               _lc(("rs2_val", 1)))

    # 4. RAM addressing + value routing (constraints.rs:73-97)
    mem_addr = _lc(("rs1_val", 1), ("bc_imm", 1), ("cf_imm_neg", -two32))
    eq_cond(_lc(("cf_load", 1), ("cf_store", 1)), mem_addr,
            _lc(("ram_addr", 4), ("one", ram_base)))
    # non-store steps (incl. loads) write back the read value
    eq_cond(_lc(("one", 1), ("cf_store", -1)),
            _lc(("ram_write", 1)), _lc(("ram_read", 1)))
    eq_cond(_lc(("cf_store", 1)), _lc(("rs2_val", 1)), _lc(("ram_write", 1)))

    # 5. lookup query <-> operands, by index mode (constraints.rs:104-182)
    packed_dims = _lc(*[(f"dim_{i}", w)
                        for i, w in enumerate(_pack_weights(c, logm))])
    packx = _lc(*[(f"chx_{i}", w) for i, w in enumerate(_pack_weights(c, b))])
    packy = _lc(*[(f"chy_{i}", w) for i, w in enumerate(_pack_weights(c, b))])

    def mode_flags(mode):
        return _lc(*[(f"flag_{nm}", 1) for nm in instr_names
                     if INS.INSTRUCTIONS[nm].index_mode == mode])

    sum_f, diff_f = mode_flags("sum"), mode_flags("diff")
    prod_f, x_f = mode_flags("prod"), mode_flags("x")
    shift_f, xy_f = mode_flags("shift"), mode_flags("xy")

    if sum_f:
        eq_cond(sum_f, packed_dims, _lc(("ax_x", 1), ("ax_y", 1)))
    if diff_f:
        eq_cond(diff_f, packed_dims,
                _lc(("ax_x", 1), ("ax_y", -1), ("one", 1 << word)))
    aux_prod("ax_prod", _lc(("rs1_val", 1)), _lc(("rs2_val", 1)))
    if prod_f:
        eq_cond(prod_f, packed_dims, _lc(("ax_prod", 1)))
    if x_f:
        eq_cond(x_f, packed_dims, _lc(("ax_x", 1)))
    if xy_f:
        for i in range(c):
            eq_cond(_lc(("cf_concat", 1)), _lc((f"dim_{i}", 1)),
                    _lc((f"chx_{i}", 1 << b), (f"chy_{i}", 1)))
    if shift_f:
        for i in range(c):
            eq_cond(shift_f, _lc((f"dim_{i}", 1)),
                    _lc((f"chx_{i}", 1 << b), (f"chy_{c - 1}", 1)))
    chunked = _lc(("cf_concat", 1)) if not shift_f else \
        _lc(("cf_concat", 1), *[(k, v) for k, v in shift_f.items()])
    if xy_f or shift_f:
        eq_cond(chunked, _lc(("ax_x", 1)), packx)
        eq_cond(chunked, _lc(("ax_y", 1)), packy)

    # 6. asserts must look up 1 (constraints.rs:138-142)
    eq_cond(_lc(("cf_assert", 1)), _lc(("lookup_out", 1)), _lc(("one", 1)))

    # 7. rd write-back chain — fully determines rd_val (stronger than the
    # reference's one-sided gates; also pins x0 writes to the old value)
    aux_prod("ax_ldrd", _lc(("cf_load", 1)), _lc(("cf_rdnz", 1)))
    aux_prod("ax_luird", _lc(("cf_lui", 1)), _lc(("cf_rdnz", 1)))
    aux_prod("ax_wlor", _lc(("cf_wlr", 1)), _lc(("cf_rdnz", 1)))
    aux_prod("ax_wpc", _lc(("cf_jump", 1)), _lc(("cf_rdnz", 1)))
    aux_ifelse("ax_t1", _lc(("ax_ldrd", 1)), _lc(("ram_read", 1)),
               _lc(("rd_pre", 1)))
    aux_ifelse("ax_t2", _lc(("ax_luird", 1)), _lc(("bc_imm", 1)),
               _lc(("ax_t1", 1)))
    aux_ifelse("ax_t3", _lc(("ax_wpc", 1)),
               _lc(*real_pc.items(), ("one", 4)), _lc(("ax_t2", 1)))
    constrain(_lc(("ax_wlor", 1)),
              _lc_sub(_lc(("lookup_out", 1)), _lc(("ax_t3", 1))),
              _lc_sub(_lc(("rd_val", 1)), _lc(("ax_t3", 1))))

    # 8. next-pc chain (constraints.rs:206-229)
    pc_plus4 = _lc(*real_pc.items(), ("one", 4))
    aux_ifelse("ax_npj", _lc(("cf_jump", 1)), _lc(("lookup_out", 1)),
               pc_plus4)
    aux_prod("ax_sb", _lc(("cf_branch", 1)), _lc(("lookup_out", 1)))
    target = _lc(*real_pc.items(), *imm_signed.items())
    aux_ifelse("ax_next_pc", _lc(("ax_sb", 1)), target, _lc(("ax_npj", 1)))

    # 9. cross-step constraints (constraints.rs:232-259), via the shifted
    # columns bc_addr_next / bc_pc_next / cf_ventry_next (each proven by the
    # batched shift sumcheck against its unshifted column):
    #  - a virtual row continues its sequence: next row index is +1, pc
    #    unchanged;
    #  - a non-virtual row ends an op: the next row's pc must equal the
    #    computed next pc AND be a sequence ENTRY row (cf_ventry), so
    #    control flow cannot enter a sequence mid-way and skip its validity
    #    asserts (gated by bc_addr_next != 0 — the halt transition fetches
    #    the reserved zero row).
    inputs.append("bc_addr_next")
    inputs.append("bc_pc_next")
    inputs.append("cf_ventry_next")
    eq_cond(_lc(("cf_virtual", 1)), _lc(("bc_addr_next", 1)),
            _lc(("bc_addr", 1), ("one", 1)))
    eq_cond(_lc(("cf_virtual", 1)), _lc(("bc_pc_next", 1)),
            _lc(("bc_pc", 1)))
    aux_prod("ax_nvgate", _lc(("bc_addr_next", 1)),
             _lc(("one", 1), ("cf_virtual", -1)))
    eq_cond(_lc(("ax_nvgate", 1)), _lc(("bc_pc_next", 1)),
            _lc(("ax_next_pc", 1)))
    eq_cond(_lc(("ax_nvgate", 1)), _lc(("cf_ventry_next", 1)),
            _lc(("one", 1)))

    k_pad = 1 << max(1, (len(rows) - 1).bit_length())
    committed = tuple(n for n in inputs
                      if n not in ("one", "bc_addr_next", "bc_pc_next",
                                   "cf_ventry_next"))
    return ConstraintSystem(
        inputs=tuple(inputs), committed=committed, aux_defs=tuple(aux_defs),
        rows=tuple(rows), k_pad=k_pad, instr_names=instr_names,
    )


# --- witness-side evaluation (host ints) ------------------------------------


def lc_eval(lc: dict, cols: dict, t: int) -> int:
    acc = 0
    for name, coeff in lc.items():
        v = 1 if name == "one" else cols[name][t]
        acc += coeff * v
    return acc % MOD


def compute_aux(cs: ConstraintSystem, cols: dict, n_steps: int):
    """Fill aux columns in evaluation order. ``cols`` maps input name ->
    list[int] length T; committed inputs must be present."""
    for d in cs.aux_defs:
        out = []
        for t in range(n_steps):
            if d.kind == "prod":
                out.append(lc_eval(d.a, cols, t) * lc_eval(d.b, cols, t)
                           % MOD)
            else:  # ifelse: cond ? then : else  (cond is 0/1)
                cond = lc_eval(d.a, cols, t)
                out.append(lc_eval(d.b if cond else d.c, cols, t))
        cols[d.name] = out
    return cols


def check_witness(cs: ConstraintSystem, cols: dict, n_steps: int):
    """Debug helper: assert every row holds at every step."""
    for k, (a, b, c) in enumerate(cs.rows):
        for t in range(n_steps):
            av, bv, cv = (lc_eval(a, cols, t), lc_eval(b, cols, t),
                          lc_eval(c, cols, t))
            if av * bv % MOD != cv:
                raise AssertionError(f"row {k} fails at step {t}: "
                                     f"{av}*{bv} != {cv} ({a} {b} {c})")


def matvec(cs: ConstraintSystem, cols: dict, n_steps: int):
    """(Az, Bz, Cz) as [k_pad * T] int lists, constraint-major layout
    (index = k*T + t, so the step variable occupies the LOW bits and is
    bound first by the sumcheck)."""
    out = []
    for sel in range(3):
        table = [0] * (cs.k_pad * n_steps)
        for k, row in enumerate(cs.rows):
            lc = row[sel]
            base = k * n_steps
            for name, coeff in lc.items():
                col = None if name == "one" else cols[name]
                for t in range(n_steps):
                    v = coeff if col is None else coeff * col[t]
                    table[base + t] = (table[base + t] + v) % MOD
        out.append(table)
    return out


# --- prover / verifier ------------------------------------------------------


class StepSpartanProof(NamedTuple):
    outer_msgs: list        # [nv][4] ints
    az: int
    bz: int
    cz: int
    shift_msgs: list        # [log T][3] ints — ONE rho-batched shift sumcheck
    shift_claims: list      # [3] ints — col_next(r_t) for SHIFT_COLS
    shift_finals: list      # [3] ints — col(z_shift), accumulator claims


# columns proven shifted-by-one via the batched eqplus1 sumcheck
SHIFT_COLS = ("bc_addr", "bc_pc", "cf_ventry")


def _comb_outer(polys, consts=None):
    eq, az, bz, cz = polys
    return F.mul(FR, eq, F.sub(FR, F.mul(FR, az, bz), cz))


def _comb_outer_lv(f, ps):
    eq, az, bz, cz = ps
    return f.mul(eq, f.sub(f.mul(az, bz), cz))


_comb_outer.lv = _comb_outer_lv


def _comb_outer_shared(polys, consts, chunk_i, t_idx):
    """Rep3 outer comb: one share-mul (Az*Bz) per round evaluation with a
    FRESH correlated zero share on its implicit reshare (mask-on-every-
    reshare, rep3/arithmetic.rs:39-48); round messages are additive shares
    the engine additionally masks and opens."""
    from ...parallel import mpc
    from ...parallel.rng import zero_shares_from_keys

    eq, az, bz, cz = polys          # eq public [h,16]; rest [3,h,16]
    key_data, rctr = consts
    mask = zero_shares_from_keys(FR, key_data, az.shape[1:-1],
                                 rctr, chunk_i, t_idx)
    prod = mpc.mul(FR, az, bz, zero_mask=mask)
    return F.mul(FR, eq[None], F.sub(FR, prod, cz))


_comb_outer_shared.wants_ctr = True


def _comb_mul2(polys, consts=None):
    # public x (public|share) — broadcasting covers both layouts
    a, b = polys
    if b.ndim > a.ndim:
        a = a[None]
    return F.mul(FR, a, b)


def _comb_mul2_lv(f, ps):
    return f.mul(ps[0], ps[1])


_comb_mul2.lv = _comb_mul2_lv


def eqplus1_table(eq_r):
    """eqp1[t'] = eq(r, t'-1) over the same domain; index 0 is zero
    (nothing maps to t'=0, and t = 2^n - 1 has no successor)."""
    rolled = jnp.roll(eq_r, 1, axis=0)
    return rolled.at[0].set(jnp.zeros((F.NLIMBS,), dtype=jnp.uint32))


def eqplus1_eval_ints(x, y):
    """Closed-form eqplus1(x, y) = MLE of [y == x + 1] (LSB-first bits):
    sum_i prod_{j<i} x_j(1-y_j) * (1-x_i)y_i * prod_{j>i} eq(x_j, y_j)."""
    n = len(x)
    total = 0
    for i in range(n):
        term = (1 - x[i]) * y[i] % MOD
        for j in range(i):
            term = term * (x[j] * (1 - y[j])) % MOD
        for j in range(i + 1, n):
            term = term * (x[j] * y[j] + (1 - x[j]) * (1 - y[j])) % MOD
        total = (total + term) % MOD
    return total % MOD


def matvec_dev(cs: ConstraintSystem, dev: dict, n_steps: int, be):
    """Az/Bz/Cz as device tables from (possibly Rep3-shared) column tables.

    Row-sparse linear combinations over the committed columns; constants
    enter via the backend (party-0 convention for shares). Layout matches
    ``matvec``: [(3,) k_pad * T, 16], constraint-major."""
    like = dev["bc_addr"]
    zero_row = jnp.zeros_like(like)
    out = []
    for sel in range(3):
        rows = []
        for row in cs.rows:
            lc = row[sel]
            acc = zero_row
            const = 0
            for name, coeff in lc.items():
                if name == "one":
                    const = coeff
                    continue
                cf = F.from_int(FR, coeff % MOD)
                acc = F.add(FR, acc,
                            F.mul(FR, jnp.broadcast_to(cf, like.shape),
                                  dev[name]))
            if const:
                acc = be.add_public_scalar(acc, const % MOD, n_steps)
            rows.append(acc)
        rows += [zero_row] * (cs.k_pad - len(rows))
        out.append(jnp.concatenate(rows, axis=-2))
    return out


def prove(ht: T.HostTranscript, cs: ConstraintSystem, dev: dict,
          n_steps: int, be):
    """Run the outer zerocheck + shift sumcheck on device tables.

    ``dev`` maps every committed input (plus "bc_addr_next") to its device
    table — [T, 16] plain or [3, T, 16] Rep3 stacks, chosen by the backend.
    Returns (proof, r_t [logT ints], shift_z [logT ints]); the caller
    appends opening claims input_i(r_t) and bc_addr(shift_z) to the batched
    opening accumulator.
    """
    log_t = (n_steps - 1).bit_length()
    assert 1 << log_t == n_steps
    nv = log_t + (cs.k_pad - 1).bit_length()

    az, bz, cz = matvec_dev(cs, dev, n_steps, be)

    tau = ht.challenges(nv)
    res = SC.prove(FR, ht.device_state(), [az, bz, cz], degree=3,
                   comb=_comb_outer_shared if be.shared else _comb_outer,
                   masks=be.sc_masks(nv, 3, 1100), shared=be.shared,
                   round_consts=be.mul_mask_consts(nv, 1101),
                   eq_split=F.from_int(FR, tau))
    ht.state = T.HostTranscript.from_device_state(res.state).state
    az_v = be.open_scalar(res.final_polys[0][..., 0, :])
    bz_v = be.open_scalar(res.final_polys[1][..., 0, :])
    cz_v = be.open_scalar(res.final_polys[2][..., 0, :])
    for v in (az_v, bz_v, cz_v):
        ht.absorb(v)
    r = [int(v) for v in F.to_int(FR, res.challenges)]
    r_t = r[:log_t]

    # batched shift sumcheck: col_next(r_t) = sum_t eqplus1(r_t, t)*col(t)
    # for SHIFT_COLS, rho-RLC'd into one degree-2 sumcheck
    r_t_dev = F.from_int(FR, r_t)
    shift_claims = [be.eval_claim(dev[c + "_next"], r_t_dev)
                    for c in SHIFT_COLS]
    for v in shift_claims:
        ht.absorb(v)
    rho = ht.challenge()
    combined = dev[SHIFT_COLS[0]]
    rho_pow = rho
    for c in SHIFT_COLS[1:]:
        rp = F.from_int(FR, rho_pow)
        combined = F.add(FR, combined,
                         F.mul(FR, jnp.broadcast_to(rp, dev[c].shape),
                               dev[c]))
        rho_pow = rho_pow * rho % MOD
    eqp1 = eqplus1_table(P.eq_table(FR, r_t_dev))
    sres = SC.prove(FR, ht.device_state(), [eqp1, combined], degree=2,
                    comb=_comb_mul2, masks=be.sc_masks(log_t, 2, 1200),
                    shared=be.shared)
    ht.state = T.HostTranscript.from_device_state(sres.state).state
    shift_z = [int(v) for v in F.to_int(FR, sres.challenges)]
    shift_z_dev = F.from_int(FR, shift_z)
    shift_finals = [be.eval_claim(dev[c], shift_z_dev) for c in SHIFT_COLS]
    for v in shift_finals:
        ht.absorb(v)

    proof = StepSpartanProof(
        outer_msgs=SC.round_msgs_to_ints(res.round_msgs),
        az=az_v, bz=bz_v, cz=cz_v,
        shift_msgs=SC.round_msgs_to_ints(sres.round_msgs),
        shift_claims=shift_claims, shift_finals=shift_finals,
    )
    return proof, r_t, shift_z


def matrix_rlc(cs: ConstraintSystem, r_k):
    """Abar_i(r_k) = sum_k eq(r_k, k) * M[k][i] for M in (A, B, C) — the
    verifier-side collapse of the reference's inner sumcheck."""
    eq_k = [1]
    for rb in r_k:
        eq_k = [e * (1 - rb) % MOD for e in eq_k] + \
               [e * rb % MOD for e in eq_k]
    outs = []
    for sel in range(3):
        coeffs = {}
        for k, row in enumerate(cs.rows):
            ek = eq_k[k]
            for name, coeff in row[sel].items():
                coeffs[name] = (coeffs.get(name, 0) + ek * coeff) % MOD
        outs.append(coeffs)
    return outs


def _eq_eval_ints(r, s):
    acc = 1
    for a, b in zip(r, s):
        acc = acc * (a * b + (1 - a) * (1 - b)) % MOD
    return acc


def verify(ht: T.HostTranscript, cs: ConstraintSystem,
           proof: StepSpartanProof, n_steps: int, openings: dict):
    """``openings``: committed-input name -> claimed eval at r_t (the caller
    checks these against the batched opening proof). Returns
    (ok, r_t, shift_z, shift_finals) — shift_finals are the SHIFT_COLS
    evals at shift_z, to be checked as opening claims too."""
    log_t = (n_steps - 1).bit_length()
    nv = log_t + (cs.k_pad - 1).bit_length()
    tau = ht.challenges(nv)
    try:
        r, expected = SC.verify(proof.outer_msgs, 0, ht)
    except ValueError:
        return False, None, None, None
    if len(proof.outer_msgs) != nv or len(proof.outer_msgs[0]) != 4:
        return False, None, None, None
    eq_v = _eq_eval_ints(tau, r)
    if eq_v * (proof.az * proof.bz - proof.cz) % MOD != expected:
        return False, None, None, None
    for v in (proof.az, proof.bz, proof.cz):
        ht.absorb(v)
    r_t, r_k = r[:log_t], r[log_t:]

    # inner check: claimed Az/Bz/Cz vs the public matrix RLC over openings
    if len(proof.shift_claims) != len(SHIFT_COLS) or \
            len(proof.shift_finals) != len(SHIFT_COLS):
        return False, None, None, None
    vals = dict(openings)
    vals["one"] = 1
    for c, claim in zip(SHIFT_COLS, proof.shift_claims):
        vals[c + "_next"] = claim
    for claimed, coeffs in zip((proof.az, proof.bz, proof.cz),
                               matrix_rlc(cs, r_k)):
        acc = 0
        for name, coeff in coeffs.items():
            if name not in vals:
                return False, None, None, None
            acc = (acc + coeff * vals[name]) % MOD
        if acc != claimed:
            return False, None, None, None

    # batched shift sumcheck:
    #   sum_j rho^j col_j_next(r_t) = sum_t eqp1(r_t, t) sum_j rho^j col_j(t)
    for v in proof.shift_claims:
        ht.absorb(v)
    rho = ht.challenge()
    claim = 0
    rho_pow = 1
    for v in proof.shift_claims:
        claim = (claim + rho_pow * v) % MOD
        rho_pow = rho_pow * rho % MOD
    try:
        shift_z, s_expected = SC.verify(proof.shift_msgs, claim, ht)
    except ValueError:
        return False, None, None, None
    eqp1_v = eqplus1_eval_ints(r_t, shift_z)
    fin = 0
    rho_pow = 1
    for v in proof.shift_finals:
        fin = (fin + rho_pow * v) % MOD
        rho_pow = rho_pow * rho % MOD
    if eqp1_v * fin % MOD != s_expected:
        return False, None, None, None
    for v in proof.shift_finals:
        ht.absorb(v)
    return True, r_t, shift_z, list(proof.shift_finals)
