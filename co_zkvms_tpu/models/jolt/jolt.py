"""Linked Jolt zkVM prover: ONE proof whose subsystems share commitments.

Maps co-jolt's ``Jolt::prove`` orchestration + batched opening reduction
(jolt/vm/jolt/mod.rs:293-484, poly/opening_proof.rs:182-291 — SURVEY.md
§2.8/§3.3): a single transcript drives

  commit all columns -> Lasso primary sumcheck -> offline memory checking
  (instruction memories + chunk-range memories + registers + RAM + bytecode,
  one batched GKR per domain size) -> uniform Spartan over the step
  constraints (models/jolt/uniform_spartan.py) -> ALL trace-domain opening
  claims reduced to ONE PST13 opening via the batched accumulator
  (ops/opening_accumulator.py), plus one small batched opening per
  init/final domain size.

What makes it a zkVM (vs round 1's unlinked subsystems): every R1CS input is
an evaluation of the SAME committed column the memory checkers fingerprint —
rs1_val is simultaneously the register-file read value (multiset-checked
against the replayed register state) and the Lasso left operand (chunk
constraints tie it to the lookup dims); lookup_out is simultaneously the
collation output and the rd write-back; bc_* columns are simultaneously the
bytecode-fetch tuple (checked against the public program image) and the
R1CS's decoded fields; pc progression crosses steps via the shift sumcheck.
Tampering any one of these breaks verification (tests/test_jolt_e2e.py).

Memory model / conventions:
- bytecode row 0 is a reserved zero row (padding steps fetch it); real
  instructions live at rows 1..len(program), so
  real_pc = code_base + 4*(bc_addr - 1).
- registers: one logical memory (64 entries: x0..x31 architectural +
  v0..v31 virtual-sequence scratch), 3 read-modify-write slots per step
  (rs1, rs2, rd) with per-slot counter columns; x0 stays 0 because the rd
  write-back chain forces rd_val = rd_pre when cf_rdnz = 0.
- RAM: word-addressed slots (addr = 4*slot + ram_base); non-store steps
  write back the read value (rmw no-op), enforced by uniform Spartan.
  JoltDevice I/O (read_write_memory/coordinator.rs:18-76): public input
  words seed the init image (slots 0..); the top 2^out_bits slots are the
  OUTPUT region, revealed in the proof and pinned by one ram_final opening
  at the output subcube (see verify step 6).
- DELIBERATE DEVIATION — per-address access counters instead of the
  reference's global timestamps: the reference stamps every access with a
  global step timestamp and must range-check (t_global - t_read) via Spice
  (timestamp_range_check.rs:14-50, a 4-memory subsystem with its own
  committed columns). Here each address carries a local access counter
  (the classic offline-memory-checking tuple (a, v, c)): the multiset
  argument alone forces read counter = #prior accesses — sound with NO
  range check while total accesses < field characteristic, deleting the
  whole range-check subsystem (fewer committed columns, fewer GKR
  instances). models/jolt/timestamp.py implements the reference-style
  global-timestamp range check standalone (tested) for the variant that
  needs it (e.g. streaming provers that cannot replay counters).
- chunk-range memories: addresses 2^BYTE * chx_i (value = address, zero
  counters init) range-check the operand chunk columns against [0, M) —
  with ranged chunks the per-chunk dim constraints pin the operand
  decomposition uniquely (see uniform_spartan.py docstring).
- the verifier derives the instruction set, circuit flags and bytecode
  image tuples from the PUBLIC program words; proofs are bound to program
  semantics, not prover-claimed metadata.

Word-size note: lookup semantics are ST.WORD-bit (geometry-configurable for
tests); guests must keep values in range for the emulator's 32-bit semantics
to coincide (tests use small operands; production geometry is WORD=32).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import field as F
from ...ops import grand_product as GP
from ...ops import opening_accumulator as OA
from ...ops import poly as P
from ...ops import pst13
from ...ops import sumcheck as SC
from ...ops import transcript as T
from ...ops.field import FR
from ...parallel import mpc
from ...parallel import shares as Sh
from .. import mpc_pcs
from . import instructions as INS
from . import lasso
from . import rv32i as rv
from . import sequences as SEQ
from . import subtables as ST
from . import uniform_spartan as US

MOD = FR.modulus
LABEL = b"co_zkvms_tpu/jolt_linked/v2"
MASK32 = 0xFFFFFFFF


class JoltProof(NamedTuple):
    comms: dict                 # column name -> commitment (x, y)
    primary_msgs: list
    rw_products: GP.GrandProductProof
    if_products: dict           # size -> GP.GrandProductProof
    spartan: US.StepSpartanProof
    evals: dict                 # (tag, name) / (tag, size, name) -> int
    t_opening: OA.ReducedOpeningProof
    m_openings: dict            # size -> pst13.OpeningProof
    n_steps: int
    mem_bits: int
    code_base: int
    ram_base: int
    # JoltDevice program I/O (read_write_memory/coordinator.rs:18-76):
    # public input words seed the RAM init image; outputs are the final
    # values of the top 2^out_bits RAM slots, proven by ONE ram_final
    # opening at (r_low, 1...1) — the output region is a dyadic subcube, so
    # the region-restricted claim is a point evaluation (no extra sumcheck)
    inputs: tuple = ()
    outputs: tuple = ()
    out_bits: int | None = None
    out_opening: object = None


# --- public structure derived from the program ------------------------------


def instr_set_for(program_words, code_base: int = 0x400):
    """Lookup instruction set implied by the public program image (after
    virtual-sequence expansion — full RV32IM)."""
    rows, _ = SEQ.expand_program(program_words, code_base)
    return tuple(sorted({r.op for r in rows if r.op is not None}))


def bytecode_image(program_words, instr_names, code_base: int = 0x400):
    """Public bytecode tuples (bitflags, rs1, rs2, rd, imm_u32, pc) of the
    EXPANDED program; row 0 is the reserved zero row. Returns
    [R_pad][6] ints (maps BytecodePreprocessing over the flat-mapped
    virtual-sequence rows, jolt/vm/jolt/mod.rs:177-199)."""
    erows, _ = SEQ.expand_program(program_words, code_base)
    rows = [(0, 0, 0, 0, 0, 0)]
    for r in erows:
        bf = sum(r.flags[cf] << k for k, cf in enumerate(US.CIRCUIT_FLAGS))
        if r.op is not None:
            bf |= 1 << (US.N_CF + instr_names.index(r.op))
        rows.append((bf, r.rs1, r.rs2, r.rd, r.imm & MASK32, r.pc))
    r_pad = 1 << max(2, (len(rows) - 1).bit_length())
    rows += [(0, 0, 0, 0, 0, 0)] * (r_pad - len(rows))
    return rows


BC_VALUE_COLS = ("bc_bitflags", "bc_rs1", "bc_rs2", "bc_rd", "bc_imm",
                 "bc_pc")


def _logical_memories(instr_names, mem_bits, r_pad):
    """Canonical logical-memory list: (kind, key, size)."""
    mems = INS.memories_for(instr_names)
    out = [("lasso", m, ST.M) for m in mems]
    out += [("rngx", i, ST.M) for i in range(ST.C)]
    out += [("rngy", i, ST.M) for i in range(ST.C)]
    out += [("regs", None, SEQ.N_REGS), ("ram", None, 1 << mem_bits),
            ("bytecode", None, r_pad)]
    return out


def _rw_cols(kind, key):
    """(addr_col, [(v_read, v_write, ct)]) column names for the rw leaves of
    one logical memory. regs contribute three slots."""
    if kind == "lasso":
        sub, ch = key
        return (f"dim_{ch}",
                [(f"E_{sub}_{ch}", f"E_{sub}_{ch}", f"lct_{sub}_{ch}")])
    if kind == "rngx":
        return (f"chx_{key}", [(None, None, f"rngx_ct_{key}")])
    if kind == "rngy":
        return (f"chy_{key}", [(None, None, f"rngy_ct_{key}")])
    if kind == "regs":
        return (None, [("rs1_val", "rs1_val", "rs1_ct"),
                       ("rs2_val", "rs2_val", "rs2_ct"),
                       ("rd_pre", "rd_val", "rd_ct")])
    if kind == "ram":
        return ("ram_addr", [("ram_read", "ram_write", "ram_ct")])
    if kind == "bytecode":
        return ("bc_addr", [(None, None, "bc_ct")])
    raise KeyError(kind)


def t_column_order(cs: US.ConstraintSystem, instr_names):
    """Canonical commit order for all trace-domain columns."""
    mems = INS.memories_for(instr_names)
    extras = [f"E_{s}_{c}" for s, c in mems]
    extras += [f"lct_{s}_{c}" for s, c in mems]
    extras += [f"rngx_ct_{i}" for i in range(ST.C)]
    extras += [f"rngy_ct_{i}" for i in range(ST.C)]
    extras += ["rs1_ct", "rs2_ct", "rd_ct", "ram_ct", "bc_ct"]
    return list(cs.committed) + extras


def m_column_order(instr_names, mem_bits, r_pad):
    """Canonical commit order for init/final-domain columns: size -> names."""
    mems = INS.memories_for(instr_names)
    by_size = {}
    by_size.setdefault(ST.M, [])
    by_size[ST.M] += [f"fct_{s}_{c}" for s, c in mems]
    by_size[ST.M] += [f"rngx_fct_{i}" for i in range(ST.C)]
    by_size[ST.M] += [f"rngy_fct_{i}" for i in range(ST.C)]
    by_size.setdefault(SEQ.N_REGS, []).extend(["reg_final", "reg_final_ct"])
    by_size.setdefault(1 << mem_bits, []).extend(
        ["ram_final", "ram_final_ct"])
    by_size.setdefault(r_pad, []).append("bc_fct")
    return {s: names for s, names in sorted(by_size.items())}


# --- witness columns --------------------------------------------------------


def build_columns(trace, program_words, instr_names, mem_bits,
                  code_base, ram_base, ram_init=None):
    """Replay the trace into per-ROW columns + init/final images.

    Each architectural trace step expands into its virtual-sequence rows
    (sequences.py, maps jolt/vm/jolt/mod.rs:156-221); the replay executes
    every expanded row over the 64-entry register file (x0..x31 + v0..v31
    scratch) with ST.WORD-bit lookup semantics — the builder is the
    authoritative witness source; the emulator supplies only the
    architectural instruction sequence and control flow."""
    mems = INS.memories_for(instr_names)
    c, byte = ST.C, ST.BYTE
    image = bytecode_image(program_words, instr_names, code_base)
    erows, pc2span = SEQ.expand_program(program_words, code_base)

    # flatten: architectural step -> (expanded row, bytecode address)
    flat = []
    for st in trace:
        a0, cnt = pc2span[st.instr.address]
        for k in range(cnt):
            flat.append((erows[a0 - 1 + k], a0 + k))
    n_real = len(flat)
    assert n_real > 0, "empty trace"
    n = max(4, 1 << (n_real - 1).bit_length())

    cols = {k: [0] * n for k in
            ["bc_addr", "bc_bitflags", "bc_rs1", "bc_rs2", "bc_rd", "bc_imm",
             "bc_pc", "rs1_val", "rs2_val", "rd_pre", "rd_val",
             "ram_addr", "ram_read", "ram_write", "lookup_out",
             "rs1_ct", "rs2_ct", "rd_ct", "ram_ct", "bc_ct"]}
    for i in range(c):
        cols[f"dim_{i}"] = [0] * n
        cols[f"chx_{i}"] = [0] * n
        cols[f"chy_{i}"] = [0] * n
    for nm in instr_names:
        cols[f"flag_{nm}"] = [0] * n
    for cf in US.CIRCUIT_FLAGS:
        cols[cf] = [0] * n
    for s, ch in mems:
        cols[f"E_{s}_{ch}"] = [0] * n
        cols[f"lct_{s}_{ch}"] = [0] * n
    for i in range(c):
        cols[f"rngx_ct_{i}"] = [0] * n
        cols[f"rngy_ct_{i}"] = [0] * n

    regs = [0] * SEQ.N_REGS
    reg_ct = {}
    ram = {k: w for k, w in enumerate(ram_init or []) if w}
    ram_ct = {}
    bc_ct = {}
    lasso_ct = {m: {} for m in mems}
    rng_ct = {("x", i): {} for i in range(c)}
    rng_ct.update({("y", i): {} for i in range(c)})
    tables = {s: ST.materialize_ints(s) for s, _ in mems}
    zero_flags = {cf: 0 for cf in US.CIRCUIT_FLAGS}

    def reg_read(a, ctr_key, t):
        cols[ctr_key + "_ct"][t] = reg_ct.get(a, 0)
        reg_ct[a] = reg_ct.get(a, 0) + 1
        return regs[a]

    x0_cur = y0_cur = 0     # original operand values at sequence entry
    xq_col, yq_col, sched = [0] * n, [0] * n, [None] * n
    for t in range(n):
        row, bc_a = flat[t] if t < n_real else (None, 0)
        if row is None:
            flags = zero_flags
            a1 = a2 = ad = 0
            imm, lk, adv, pc = 0, None, None, 0
        else:
            flags = row.flags
            a1, a2, ad = row.rs1, row.rs2, row.rd
            imm, lk, adv, pc = row.imm, row.op, row.advice, row.pc
        imm_u = imm & MASK32
        for cf in US.CIRCUIT_FLAGS:
            cols[cf][t] = flags[cf]
        cols["bc_addr"][t] = bc_a
        bf, r1, r2, rd, immv, pcv = image[bc_a]
        cols["bc_bitflags"][t] = bf
        cols["bc_rs1"][t], cols["bc_rs2"][t] = r1, r2
        cols["bc_rd"][t], cols["bc_imm"][t] = rd, immv
        cols["bc_pc"][t] = pcv
        assert (r1, r2, rd, immv, pcv) == (a1, a2, ad, imm_u, pc)
        cols["bc_ct"][t] = bc_ct.get(bc_a, 0)
        bc_ct[bc_a] = bc_ct.get(bc_a, 0) + 1

        if row is not None and flags["cf_ventry"]:
            # operand values of the ORIGINAL op — advice closures are
            # evaluated on these, captured before the sequence writes
            x0_cur, y0_cur = regs[row.a_rs1], regs[row.a_rs2]

        rs1_v = reg_read(a1, "rs1", t)
        rs2_v = reg_read(a2, "rs2", t)
        rd_p = reg_read(ad, "rd", t)
        cols["rs1_val"][t] = rs1_v
        cols["rs2_val"][t] = rs2_v
        cols["rd_pre"][t] = rd_p

        x_q = pc if flags["cf_left_pc"] else rs1_v
        y_q = imm_u if flags["cf_right_imm"] else rs2_v
        out = 0
        if lk is not None:
            spec = INS.INSTRUCTIONS[lk]
            cols[f"flag_{lk}"][t] = 1
            if lk == "ADVICE":
                # the advice VALUE is the lookup index (virtual_advice.rs):
                # dims/chunks range-check it, no operand constraint applies
                x_q = adv(x0_cur, y0_cur)
            out = INS.lookup_entry(lk, x_q, y_q)
            dims = spec.to_indices(x_q, y_q)
        else:
            dims = [0] * c
        xq_col[t], yq_col[t], sched[t] = x_q, y_q, lk
        cols["lookup_out"][t] = out
        for i in range(c):
            cols[f"dim_{i}"][t] = dims[i]
            sh = byte * (c - 1 - i)
            cols[f"chx_{i}"][t] = (x_q >> sh) & ((1 << byte) - 1)
            cols[f"chy_{i}"][t] = (y_q >> sh) & ((1 << byte) - 1)

        # lasso + range memory replay
        for m in mems:
            sub, ch = m
            a = dims[ch]
            cols[f"E_{sub}_{ch}"][t] = int(tables[sub][a])
            cols[f"lct_{sub}_{ch}"][t] = lasso_ct[m].get(a, 0)
            lasso_ct[m][a] = lasso_ct[m].get(a, 0) + 1
        for i in range(c):
            for xy, colk in (("x", f"chx_{i}"), ("y", f"chy_{i}")):
                a = cols[colk][t] << byte
                k = (xy, i)
                cols[f"rng{xy}_ct_{i}"][t] = rng_ct[k].get(a, 0)
                rng_ct[k][a] = rng_ct[k].get(a, 0) + 1

        # RAM replay (word slots; mem_addr = rs1_val + imm_signed)
        if flags["cf_load"] or flags["cf_store"]:
            addr_v = rs1_v + imm - ram_base
            slot, off = divmod(addr_v, 4)
            assert off == 0 and 0 <= slot < (1 << mem_bits), hex(addr_v)
        else:
            slot = 0
        cur = ram.get(slot, 0)
        cols["ram_addr"][t] = slot
        cols["ram_read"][t] = cur
        wv = rs2_v if flags["cf_store"] else cur
        cols["ram_write"][t] = wv
        ram[slot] = wv
        cols["ram_ct"][t] = ram_ct.get(slot, 0)
        ram_ct[slot] = ram_ct.get(slot, 0) + 1

        # rd write-back — mirrors uniform Spartan's flag chain exactly
        rdnz = flags["cf_rdnz"]
        rd_v = rd_p
        if flags["cf_load"] and rdnz:
            rd_v = cur
        if flags["cf_lui"] and rdnz:
            rd_v = imm_u
        if flags["cf_jump"] and rdnz:
            rd_v = (pc + 4) % MOD
        if flags["cf_wlr"] and rdnz:
            rd_v = out
        cols["rd_val"][t] = rd_v
        regs[ad] = rd_v

    # shifted columns for the cross-step constraints
    for cname in US.SHIFT_COLS:
        cols[cname + "_next"] = cols[cname][1:] + [0]

    r_pad = len(image)
    m_cols = {}
    for m in mems:
        sub, ch = m
        m_cols[f"fct_{sub}_{ch}"] = [lasso_ct[m].get(a, 0)
                                     for a in range(ST.M)]
    for i in range(c):
        m_cols[f"rngx_fct_{i}"] = [rng_ct[("x", i)].get(a, 0)
                                   for a in range(ST.M)]
        m_cols[f"rngy_fct_{i}"] = [rng_ct[("y", i)].get(a, 0)
                                   for a in range(ST.M)]
    m_cols["reg_final"] = list(regs)
    m_cols["reg_final_ct"] = [reg_ct.get(a, 0) for a in range(SEQ.N_REGS)]
    m_cols["ram_final"] = [ram.get(s, 0) for s in range(1 << mem_bits)]
    m_cols["ram_final_ct"] = [ram_ct.get(s, 0) for s in range(1 << mem_bits)]
    m_cols["bc_fct"] = [bc_ct.get(a, 0) for a in range(r_pad)]
    wgen = {"xq": xq_col, "yq": yq_col, "sched": sched}
    return cols, m_cols, n, r_pad, wgen


# --- fingerprints -----------------------------------------------------------


def _fp_ints(gamma, tau, addr, values, ct):
    acc = addr
    g = gamma
    for v in values:
        acc = (acc + g * v) % MOD
        g = g * gamma % MOD
    return (acc + g * ct - tau) % MOD


# --- proving backends -------------------------------------------------------


class PlainBackend:
    """Single-party proving: plain [n, 16] tables."""

    shared = False

    def make_dev(self, cols_ints):
        return {k: F.from_int(FR, [v % MOD for v in vals])
                for k, vals in cols_ints.items()}

    def lift(self, t):
        return t

    def commit(self, srs, t):
        return pst13.commit(srs, t)

    def commit_batch(self, srs, tables):
        return pst13.commit_batch(srs, tables)

    def eval_claims(self, tables, point):
        """Evaluate many MLEs at one point with ONE host fetch: each
        P.evaluate is pure device work; stacking the [16]-limb results and
        converting once removes the per-claim device_get (107 s of the
        measured sha2-chain e2e wall; README 'Performance')."""
        vs = jnp.stack([P.evaluate(FR, t, point) for t in tables])
        return [int(v) for v in F.to_int(FR, vs)]

    def sc_masks(self, nv, degree, tag):
        return None

    def mul_mask_consts(self, nv, tag):
        return None

    def gp_kwargs(self, tag):
        return {}

    def oa_kwargs(self, tag):
        return {}

    def stack_gp(self, leaves):
        return jnp.stack(leaves)

    def open_scalar(self, x):
        return int(F.to_int(FR, x))

    def eval_claim(self, t, point):
        return int(F.to_int(FR, P.evaluate(FR, t, point)))

    def add_public_scalar(self, acc, c, n_steps):
        cf = F.from_int(FR, c)
        return F.add(FR, acc, jnp.broadcast_to(cf, acc.shape))

    def add_one(self, ct):
        return F.add(FR, ct, jnp.broadcast_to(F.ones_mont(FR), ct.shape))

    def fp(self, gamma, tau_i, addr, values, ct):
        """gamma^(k+1) ct + sum_i gamma^(i+1) v_i + addr - tau."""
        acc = addr
        g = gamma
        for v in values:
            acc = F.add(FR, acc, F.mul(FR, jnp.broadcast_to(g, v.shape), v))
            g = F.mul(FR, g, gamma)
        acc = F.add(FR, acc, F.mul(FR, jnp.broadcast_to(g, ct.shape), ct))
        tau = F.from_int(FR, tau_i)
        return F.sub(FR, acc, jnp.broadcast_to(tau, acc.shape))

    def batch_open(self, srs, tables, eta, point):
        return pst13.batch_open(srs, tables, eta, point)

    def open_at(self, srs, table, point):
        return pst13.open_at(srs, table, point)


class Rep3Backend:
    """3-party Rep3 proving over [3, n, 16] share stacks (maps co-jolt's
    JoltRep3Prover, jolt/vm/jolt/worker.rs:174-266): commitments are
    per-party MSMs G1-merged, sumcheck round messages and GKR layer products
    are masked with correlated zero shares, opening evaluations are computed
    share-side (mpc.eval_open) and only the scalars are opened. Proofs are
    bit-identical to PlainBackend on the same witness."""

    shared = True

    def __init__(self, share_key, mask_key):
        from ...parallel.rng import CorrelatedRng

        self.share_key = share_key
        self.crng = CorrelatedRng.create(mask_key)

    _ctr = 0

    def make_dev(self, cols_ints):
        out = {}
        for k, vals in sorted(cols_ints.items()):
            key = jax.random.fold_in(self.share_key, Rep3Backend._ctr_next(self))
            out[k] = Sh.share(FR, key,
                              F.from_int(FR, [v % MOD for v in vals]))
        return out

    def _ctr_next(self):
        self._ctr += 1
        return self._ctr

    def lift(self, t):
        return Sh.promote_public(FR, t)

    def commit(self, srs, t):
        return mpc_pcs.commit_shares(srs, t)

    def commit_batch(self, srs, tables):
        return mpc_pcs.commit_shares_batch(srs, tables)

    def eval_claims(self, tables, point):
        """Share-side evaluations opened through ONE combine + host fetch
        (see PlainBackend.eval_claims). Only the scalar evaluations are
        opened, exactly as per-claim mpc.eval_open."""
        vs = jnp.stack([mpc.eval_shares(FR, t, point) for t in tables],
                       axis=1)                       # [3, k, 16]
        return [int(v) for v in F.to_int(FR, Sh.combine(FR, vs))]

    def sc_masks(self, nv, degree, tag):
        return jnp.stack([
            self.crng.zero_shares(FR, 100_000 * tag + j, (degree + 1,))
            for j in range(nv)
        ])

    def mul_mask_consts(self, nv, tag):
        """Per-round (key_data, counter) feeding fresh mul-chain reshare
        masks inside a shared collation comb (lasso._monomial_comb_factory)."""
        return [(self.crng.key_data,
                 jnp.uint32(100_000 * tag + 50_000 + j))
                for j in range(nv)]

    def gp_kwargs(self, tag):
        return {"shared": True, "masks_rng": self.crng,
                "mask_base": 100_000 * tag}

    def oa_kwargs(self, tag):
        return {"shared": True, "masks_rng": self.crng,
                "mask_base": 100_000 * tag}

    def stack_gp(self, leaves):
        return jnp.stack(leaves, axis=1)

    def open_scalar(self, x):
        return int(F.to_int(FR, Sh.combine(FR, x)))

    def eval_claim(self, t, point):
        return mpc.eval_open(FR, t, point)

    def add_public_scalar(self, acc, c, n_steps):
        cf = F.from_int(FR, c)
        return mpc.add_public(FR, acc, jnp.broadcast_to(cf, acc.shape[1:]))

    def add_one(self, ct):
        return mpc.add_public(
            FR, ct, jnp.broadcast_to(F.ones_mont(FR), ct.shape[1:]))

    def fp(self, gamma, tau_i, addr, values, ct):
        acc = addr
        g = gamma
        for v in values:
            acc = F.add(FR, acc, F.mul(FR, jnp.broadcast_to(g, v.shape), v))
            g = F.mul(FR, g, gamma)
        acc = F.add(FR, acc, F.mul(FR, jnp.broadcast_to(g, ct.shape), ct))
        neg_tau = F.from_int(FR, (-tau_i) % MOD)
        return mpc.add_public(FR, acc,
                              jnp.broadcast_to(neg_tau, acc.shape[1:]))

    def batch_open(self, srs, tables, eta, point):
        return mpc_pcs.batch_open_shares(srs, tables, eta, point)

    def open_at(self, srs, table, point):
        return mpc_pcs.open_shares(srs, table, point)


# --- prover -----------------------------------------------------------------


def prove(program_words, srs: pst13.SRS, mem_bits: int = 8,
          max_steps: int = 1 << 12, memory=None,
          code_base: int = 0x400, ram_base: int = 0x100,
          inputs=None, out_bits: int | None = None) -> JoltProof:
    """``inputs``: public u32 words seeded into RAM slots 0.. (the guest
    reads them with LW at ram_base + 4k). ``out_bits``: reserve the top
    2^out_bits RAM slots as the OUTPUT region — their final values are
    revealed in the proof and checked by the verifier (JoltDevice I/O)."""
    return _prove_impl(PlainBackend(), program_words, srs, mem_bits,
                       max_steps, memory, code_base, ram_base,
                       inputs=inputs, out_bits=out_bits)


def prove_rep3(program_words, srs: pst13.SRS, mem_bits: int = 8,
               max_steps: int = 1 << 12, memory=None,
               code_base: int = 0x400, ram_base: int = 0x100,
               share_key=None, mask_key=None,
               witness_mode: str = "coordinator",
               inputs=None, out_bits: int | None = None) -> JoltProof:
    """Rep3 MPC proving of the full linked Jolt zkVM (maps
    JoltRep3::init_rep3 + prove_rep3, jolt/vm/jolt/coordinator.rs:35-223).
    Produces the SAME JoltProof object, verified by the standard verifier,
    bit-identical to the single-party proof.

    ``witness_mode``:
    - "coordinator": the trace holder secret-shares every column.
    - "mpc": only the per-row OPERANDS are ring-shared (2 columns); every
      lookup-layer column — dims, operand chunks, subtable reads, all
      read/final counters, range counters, collated outputs — is computed
      share-side by models/jolt/mpc_witness (a2b bit banks + one-hot
      tensor chains + scan counters), so no party materializes them in
      plaintext (maps generate_witness_rep3,
      jolt/vm/jolt/witness.rs:129-181 + instruction_lookups/witness.rs:52-210).
    """
    be = Rep3Backend(
        share_key if share_key is not None else jax.random.key(11),
        mask_key if mask_key is not None else jax.random.key(13),
    )
    return _prove_impl(be, program_words, srs, mem_bits, max_steps, memory,
                       code_base, ram_base, witness_mode=witness_mode,
                       inputs=inputs, out_bits=out_bits)


def _mpc_lookup_columns(be, wgen, instr_names, n):
    """Share-side lookup witness from ring-shared operands. Returns
    (trace-domain stacks, init/final-domain stacks) keyed by column name."""
    from . import mpc_witness as MW

    kx = jax.random.fold_in(be.share_key, 999_001)
    kw = jax.random.fold_in(be.share_key, 999_002)
    xr, yr = MW.share_operands(kx, wgen["xq"], wgen["yq"])
    wit, chunks = MW.generate_witness_rep3(
        kw, xr, yr, wgen["sched"], instr_names=instr_names, pad_to=n,
        operand_chunks=True)
    tdev = {"lookup_out": wit.outputs}
    for i in range(ST.C):
        tdev[f"dim_{i}"] = wit.dims[i]
        tdev[f"chx_{i}"] = chunks[f"chx_{i}"]
        tdev[f"chy_{i}"] = chunks[f"chy_{i}"]
        tdev[f"rngx_ct_{i}"] = chunks[f"rngx_ct_{i}"]
        tdev[f"rngy_ct_{i}"] = chunks[f"rngy_ct_{i}"]
    for sub, ch in wit.memories:
        tdev[f"E_{sub}_{ch}"] = wit.e_polys[(sub, ch)]
        tdev[f"lct_{sub}_{ch}"] = wit.read_cts[(sub, ch)]
    mdev = {}
    for sub, ch in wit.memories:
        mdev[f"fct_{sub}_{ch}"] = wit.final_cts[(sub, ch)]
    for i in range(ST.C):
        mdev[f"rngx_fct_{i}"] = chunks[f"rngx_fct_{i}"]
        mdev[f"rngy_fct_{i}"] = chunks[f"rngy_fct_{i}"]
    return tdev, mdev


def _prove_impl(be, program_words, srs, mem_bits, max_steps, memory,
                code_base, ram_base,
                witness_mode: str = "coordinator",
                inputs=None, out_bits: int | None = None) -> JoltProof:
    inputs = [v & MASK32 for v in (inputs or [])]
    assert len(inputs) <= (1 << mem_bits) - ((1 << out_bits) if out_bits
                                             else 0)
    # seed guest memory with the public input words (JoltDevice inputs)
    memory = dict(memory or {})
    for k, w in enumerate(inputs):
        for b in range(4):
            memory[ram_base + 4 * k + b] = (w >> (8 * b)) & 0xFF
    emu = rv.Emulator(program_words, base=code_base, memory=memory,
                      max_steps=max_steps)
    trace = emu.run()
    instr_names = instr_set_for(program_words, code_base)
    cs = US.build(instr_names, code_base, ram_base)
    cols, m_cols, n, r_pad, wgen = build_columns(
        trace, program_words, instr_names, mem_bits, code_base, ram_base,
        ram_init=inputs)
    US.compute_aux(cs, cols, n)
    US.check_witness(cs, cols, n)
    log_n = n.bit_length() - 1
    mems = INS.memories_for(instr_names)
    image = bytecode_image(program_words, instr_names, code_base)

    # device tables (plain or Rep3-shared, per backend); in mpc witness
    # mode the lookup-layer columns come from shared-operand MPC generation
    t_mpc, m_mpc = {}, {}
    if witness_mode == "mpc":
        assert be.shared, "witness_mode='mpc' requires the Rep3 backend"
        t_mpc, m_mpc = _mpc_lookup_columns(be, wgen, instr_names, n)
    t_order = t_column_order(cs, instr_names)
    dev = be.make_dev({k: cols[k] for k in t_order if k not in t_mpc})
    dev.update(t_mpc)
    nxt = be.make_dev({c + "_next": cols[c + "_next"]
                       for c in US.SHIFT_COLS})
    dev.update(nxt)
    m_order = m_column_order(instr_names, mem_bits, r_pad)
    mdev = be.make_dev({nm: m_cols[nm]
                        for names in m_order.values() for nm in names
                        if nm not in m_mpc})
    mdev.update(m_mpc)

    # JoltDevice public I/O: outputs = final values of the top output slots
    outputs = ()
    if out_bits is not None:
        out_lo = (1 << mem_bits) - (1 << out_bits)
        outputs = tuple(m_cols["ram_final"][s]
                        for s in range(out_lo, 1 << mem_bits))

    ht = T.HostTranscript(LABEL)
    ht.absorb(n)
    for v in inputs:
        ht.absorb(v)
    for v in outputs:
        ht.absorb(v)
    # all commitments are absorbed before the first challenge is drawn, so
    # every commit MSM dispatches up-front and finishes through ONE batched
    # fetch (commit_batch) — the sequential per-commit host waits were 82%
    # of the measured sha2-chain commit-phase wall
    t_names = t_column_order(cs, instr_names)
    m_list = [(s, nm) for s, names in m_order.items() for nm in names]
    cms = be.commit_batch(srs, [dev[k] for k in t_names]
                          + [mdev[nm] for _, nm in m_list])
    comms = {}
    for k, cm in zip(t_names, cms[: len(t_names)]):
        comms[k] = cm
        ht.absorb_point(cm.xy)
    for (s, nm), cm in zip(m_list, cms[len(t_names):]):
        comms[("m", s, nm)] = cm
        ht.absorb_point(cm.xy)

    evals = {}
    t_claims = []       # (table, point_dev, value) in canonical order

    def claims(tag, names, point_dev):
        """Batched trace-domain opening claims at one point (one fetch)."""
        tabs = [dev[nm] for nm in names]
        vs = be.eval_claims(tabs, point_dev)
        for nm, tab, v in zip(names, tabs, vs):
            evals[(tag, nm)] = v
            t_claims.append((tab, point_dev, v))
        return vs

    # 1. Lasso primary sumcheck (collation zerocheck over the trace
    # domain; Dao-Thaler split-eq)
    r = ht.challenges(log_n)
    polys = ([dev[f"flag_{nm}"] for nm in instr_names]
             + [dev[f"E_{s}_{c}"] for s, c in mems] + [dev["lookup_out"]])
    degree = 2 + max(INS.INSTRUCTIONS[nm].degree for nm in instr_names)
    comb, mono_consts = lasso.monomial_setup(instr_names, mems,
                                             shared=be.shared)
    res = SC.prove(FR, ht.device_state(), polys, degree=degree, comb=comb,
                   consts=mono_consts, masks=be.sc_masks(log_n, degree, 10),
                   shared=be.shared,
                   round_consts=be.mul_mask_consts(log_n, 10),
                   eq_split=F.from_int(FR, r))
    ht.state = T.HostTranscript.from_device_state(res.state).state
    r_z = res.challenges
    claims("rz", [f"flag_{nm}" for nm in instr_names]
           + [f"E_{s}_{c}" for s, c in mems] + ["lookup_out"], r_z)

    # 2. memory checking: one rw GKR batch (T domain) + per-size init/final
    gamma_i, tau_i = ht.challenges(2)
    gamma = F.from_int(FR, gamma_i)
    logical = _logical_memories(instr_names, mem_bits, r_pad)

    rw_leaves = []
    for kind, key, size in logical:
        addr_col, slots = _rw_cols(kind, key)
        if kind in ("rngx", "rngy"):
            a = F.mul(FR, jnp.broadcast_to(
                F.from_int(FR, 1 << ST.BYTE), dev[addr_col].shape),
                dev[addr_col])
            vals = [a]          # value == address (identity range table)
        elif kind == "bytecode":
            a = dev[addr_col]
            vals = [dev[k] for k in BC_VALUE_COLS]
        else:
            a = dev[addr_col] if addr_col else None
            vals = None
        for vr, vw, ctk in slots:
            ct = dev[ctk]
            ctw = be.add_one(ct)
            if kind == "regs":
                a = dev[{"rs1_val": "bc_rs1", "rs2_val": "bc_rs2",
                         "rd_pre": "bc_rd"}[vr]]
            rvals = vals if vals is not None else [dev[vr]]
            wvals = vals if vals is not None else [dev[vw]]
            rw_leaves.append(be.fp(gamma, tau_i, a, rvals, ct))
            rw_leaves.append(be.fp(gamma, tau_i, a, wvals, ctw))

    state = ht.device_state()
    state, rw_proof, rho_rw, _ = GP.prove_batched(
        state, be.stack_gp(rw_leaves), **be.gp_kwargs(20))
    ht.state = T.HostTranscript.from_device_state(state).state

    # rw-side opening claims at rho_rw
    claims("rw", _rw_claim_names(instr_names), rho_rw)

    # init/final batches grouped by size
    if_proofs = {}
    rho_if = {}
    sizes = sorted({size for _, _, size in logical})
    for si, s in enumerate(sizes):
        leaves = []
        addr_s = be.lift(F.from_int(FR, list(range(s))))
        zero_p = be.lift(jnp.zeros((s, F.NLIMBS), dtype=jnp.uint32))
        for kind, key, size in logical:
            if size != s:
                continue
            if kind == "lasso":
                sub, ch = key
                tval = be.lift(ST.materialize(sub))
                leaves.append(be.fp(gamma, tau_i, addr_s, [tval], zero_p))
                leaves.append(be.fp(gamma, tau_i, addr_s, [tval],
                                    mdev[f"fct_{sub}_{ch}"]))
            elif kind in ("rngx", "rngy"):
                leaves.append(be.fp(gamma, tau_i, addr_s, [addr_s], zero_p))
                leaves.append(be.fp(gamma, tau_i, addr_s, [addr_s],
                                    mdev[f"rng{kind[3]}_fct_{key}"]))
            elif kind == "regs":
                leaves.append(be.fp(gamma, tau_i, addr_s, [zero_p], zero_p))
                leaves.append(be.fp(gamma, tau_i, addr_s, [mdev["reg_final"]],
                                    mdev["reg_final_ct"]))
            elif kind == "ram":
                v_init = inputs + [0] * (s - len(inputs))
                vi = be.lift(F.from_int(FR, v_init))
                leaves.append(be.fp(gamma, tau_i, addr_s, [vi], zero_p))
                leaves.append(be.fp(gamma, tau_i, addr_s, [mdev["ram_final"]],
                                    mdev["ram_final_ct"]))
            elif kind == "bytecode":
                tup = [be.lift(F.from_int(FR, [row[i] for row in image]))
                       for i in range(len(BC_VALUE_COLS))]
                leaves.append(be.fp(gamma, tau_i, addr_s, tup, zero_p))
                leaves.append(be.fp(gamma, tau_i, addr_s, tup,
                                    mdev["bc_fct"]))
        state = ht.device_state()
        state, pr, rho_s, _ = GP.prove_batched(
            state, be.stack_gp(leaves), **be.gp_kwargs(30 + si))
        ht.state = T.HostTranscript.from_device_state(state).state
        if_proofs[s] = pr
        rho_if[s] = rho_s
        vs = be.eval_claims([mdev[nm] for nm in m_order[s]], rho_s)
        for nm, v in zip(m_order[s], vs):
            evals[("if", s, nm)] = v

    # 3. uniform Spartan over the step constraints
    sp_proof, r_t, shift_z = US.prove(ht, cs, dev, n, be)
    r_t_dev = F.from_int(FR, r_t)
    claims("rt", list(cs.committed), r_t_dev)
    shift_z_dev = F.from_int(FR, shift_z)
    shift_vs = claims("shift", list(US.SHIFT_COLS), shift_z_dev)
    for fin, v in zip(sp_proof.shift_finals, shift_vs):
        assert v == fin
    # execution must START at the program entry: step 0 is a sequence-entry
    # row at pc = code_base (pins bc_addr[0] via the bytecode multiset;
    # without this a prover could begin mid-sequence, skipping asserts)
    t0_dev = F.from_int(FR, [0] * log_n)
    claims("t0", ["cf_ventry", "bc_pc"], t0_dev)
    assert evals[("t0", "cf_ventry")] == 1
    assert evals[("t0", "bc_pc")] == code_base

    # 4. reduce ALL trace-domain claims to one PST13 opening
    t_open = OA.reduce_and_prove(ht, t_claims, srs, **be.oa_kwargs(40))

    # 5. per-size batched openings of the init/final columns
    m_open = {}
    for s in sizes:
        for nm in m_order[s]:
            ht.absorb(evals[("if", s, nm)])
        eta = ht.challenge()
        _, pr = be.batch_open(srs, [mdev[nm] for nm in m_order[s]],
                              F.from_int(FR, eta), rho_if[s])
        m_open[s] = pr

    # 6. output-region claim: the output subcube has its high address bits
    # all-1, so ram_final restricted to it evaluated at r_low IS
    # ram_final(r_low, 1..1) — one opening, no extra sumcheck
    out_opening = None
    if out_bits is not None:
        r_low = ht.challenges(out_bits)
        pt = r_low + [1] * (mem_bits - out_bits)
        v_out, out_opening = be.open_at(srs, mdev["ram_final"],
                                        F.from_int(FR, pt))
        assert v_out == _mle_eval_ints(list(outputs), r_low)
        ht.absorb(v_out)

    return JoltProof(
        comms={k: v.xy for k, v in comms.items()},
        primary_msgs=SC.round_msgs_to_ints(res.round_msgs),
        rw_products=rw_proof,
        if_products=if_proofs,
        spartan=sp_proof,
        evals=evals,
        t_opening=t_open,
        m_openings=m_open,
        n_steps=n,
        mem_bits=mem_bits,
        code_base=code_base,
        ram_base=ram_base,
        inputs=tuple(inputs),
        outputs=outputs,
        out_bits=out_bits,
        out_opening=out_opening,
    )


def _rw_claim_names(instr_names):
    """Columns whose rho_rw openings reconstruct the rw leaf claims."""
    mems = INS.memories_for(instr_names)
    names = []
    for s, c in mems:
        names += [f"dim_{c}", f"E_{s}_{c}", f"lct_{s}_{c}"]
    for i in range(ST.C):
        names += [f"chx_{i}", f"rngx_ct_{i}"]
    for i in range(ST.C):
        names += [f"chy_{i}", f"rngy_ct_{i}"]
    names += ["bc_rs1", "rs1_val", "rs1_ct", "bc_rs2", "rs2_val", "rs2_ct",
              "bc_rd", "rd_pre", "rd_val", "rd_ct",
              "ram_addr", "ram_read", "ram_write", "ram_ct",
              "bc_addr", "bc_bitflags", "bc_imm", "bc_pc", "bc_ct"]
    seen, out = set(), []
    for nm in names:
        if nm not in seen:
            seen.add(nm)
            out.append(nm)
    return out


# --- verifier ---------------------------------------------------------------


def _mle_eval_ints(values, rho):
    table = [1]
    for rb in rho:
        table = [x * (1 - rb) % MOD for x in table] + \
                [x * rb % MOD for x in table]
    return sum(v % MOD * e for v, e in zip(values, table)) % MOD


def verify(proof: JoltProof, program_words, srs: pst13.SRS,
           inputs=None) -> bool:
    """``inputs``: the public input words the verifier expects (optional —
    when given, the proof must be bound to exactly these)."""
    if inputs is not None and tuple(v & MASK32 for v in inputs) != \
            tuple(proof.inputs):
        return False
    try:
        instr_names = instr_set_for(program_words, proof.code_base)
    except (NotImplementedError, ValueError, KeyError):
        return False
    cs = US.build(instr_names, proof.code_base, proof.ram_base)
    mems = INS.memories_for(instr_names)
    image = bytecode_image(program_words, instr_names, proof.code_base)
    r_pad = len(image)
    n = proof.n_steps
    log_n = n.bit_length() - 1
    if 1 << log_n != n:
        return False
    m_order = m_column_order(instr_names, proof.mem_bits, r_pad)
    logical = _logical_memories(instr_names, proof.mem_bits, r_pad)
    ev = proof.evals

    if proof.out_bits is not None and \
            len(proof.outputs) != (1 << proof.out_bits):
        return False
    ht = T.HostTranscript(LABEL)
    ht.absorb(n)
    for v in proof.inputs:
        ht.absorb(v)
    for v in proof.outputs:
        ht.absorb(v)
    t_order = t_column_order(cs, instr_names)
    for k in t_order:
        if k not in proof.comms:
            return False
        ht.absorb_point(proof.comms[k])
    for s, names in m_order.items():
        for nm in names:
            if ("m", s, nm) not in proof.comms:
                return False
            ht.absorb_point(proof.comms[("m", s, nm)])

    t_claims = []           # (point ints, value) canonical order

    def need(tag, name, point):
        if (tag, name) not in ev:
            raise KeyError
        t_claims.append((point, ev[(tag, name)]))
        return ev[(tag, name)]

    try:
        # 1. primary sumcheck
        r = ht.challenges(log_n)
        degree = 2 + max(INS.INSTRUCTIONS[nm].degree for nm in instr_names)
        r_z, expected = SC.verify(proof.primary_msgs, 0, ht)
        if len(proof.primary_msgs[0]) != degree + 1:
            return False
        ev_mem = {}
        acc = 0
        for s, c in mems:
            ev_mem[(s, c)] = ev[("rz", f"E_{s}_{c}")]
        ops = INS.HostOps()
        for nm in instr_names:
            g = INS.INSTRUCTIONS[nm].combine(ops, ev_mem)
            acc = (acc + ev[("rz", f"flag_{nm}")] * g) % MOD
        out_v = ev[("rz", "lookup_out")]
        if US._eq_eval_ints(r, r_z) * (acc - out_v) % MOD != expected:
            return False
        for nm in instr_names:
            need("rz", f"flag_{nm}", r_z)
        for s, c in mems:
            need("rz", f"E_{s}_{c}", r_z)
        need("rz", "lookup_out", r_z)

        # 2. memory checking
        gamma, tau = ht.challenges(2)
        rho_rw, claims_rw = GP.verify_batched(proof.rw_products, ht)

        rw_vals = {nm: ev[("rw", nm)] for nm in _rw_claim_names(instr_names)}
        li = 0
        prods_rw = {}
        pi = 0
        for kind, key, size in logical:
            addr_col, slots = _rw_cols(kind, key)
            n_slots = len(slots)
            r_prod = w_prod = 1
            for vr, vw, ctk in slots:
                ct = rw_vals[ctk]
                if kind in ("rngx", "rngy"):
                    a = (1 << ST.BYTE) * rw_vals[addr_col] % MOD
                    rv_, wv_ = [a], [a]
                elif kind == "bytecode":
                    a = rw_vals[addr_col]
                    rv_ = wv_ = [rw_vals[k] for k in BC_VALUE_COLS]
                elif kind == "regs":
                    a = rw_vals[{"rs1_val": "bc_rs1", "rs2_val": "bc_rs2",
                                 "rd_pre": "bc_rd"}[vr]]
                    rv_, wv_ = [rw_vals[vr]], [rw_vals[vw]]
                else:
                    a = rw_vals[addr_col]
                    rv_, wv_ = [rw_vals[vr]], [rw_vals[vw]]
                fp_r = _fp_ints(gamma, tau, a, rv_, ct)
                fp_w = _fp_ints(gamma, tau, a, wv_, (ct + 1) % MOD)
                if claims_rw[li] != fp_r or claims_rw[li + 1] != fp_w:
                    return False
                r_prod = r_prod * proof.rw_products.products[li] % MOD
                w_prod = w_prod * proof.rw_products.products[li + 1] % MOD
                li += 2
            prods_rw[(kind, key)] = (r_prod, w_prod)

        # init/final batches
        prods_if = {}
        sizes = sorted({size for _, _, size in logical})
        for s in sizes:
            if s not in proof.if_products:
                return False
            rho_s, claims_s = GP.verify_batched(proof.if_products[s], ht)
            idx_eval = sum((1 << bnum) * rho_s[bnum]
                           for bnum in range(len(rho_s))) % MOD
            li2 = 0
            for kind, key, size in logical:
                if size != s:
                    continue
                if kind == "lasso":
                    sub, ch = key
                    tv = ST.evaluate_mle_ints(sub, rho_s)
                    fct = ev[("if", s, f"fct_{sub}_{ch}")]
                    fp_i = _fp_ints(gamma, tau, idx_eval, [tv], 0)
                    fp_f = _fp_ints(gamma, tau, idx_eval, [tv], fct)
                elif kind in ("rngx", "rngy"):
                    fct = ev[("if", s, f"rng{kind[3]}_fct_{key}")]
                    fp_i = _fp_ints(gamma, tau, idx_eval, [idx_eval], 0)
                    fp_f = _fp_ints(gamma, tau, idx_eval, [idx_eval], fct)
                elif kind == "regs":
                    fp_i = _fp_ints(gamma, tau, idx_eval, [0], 0)
                    fp_f = _fp_ints(gamma, tau, idx_eval,
                                    [ev[("if", s, "reg_final")]],
                                    ev[("if", s, "reg_final_ct")])
                elif kind == "ram":
                    v_init = list(proof.inputs) + \
                        [0] * (s - len(proof.inputs))
                    fp_i = _fp_ints(gamma, tau, idx_eval,
                                    [_mle_eval_ints(v_init, rho_s)], 0)
                    fp_f = _fp_ints(gamma, tau, idx_eval,
                                    [ev[("if", s, "ram_final")]],
                                    ev[("if", s, "ram_final_ct")])
                else:  # bytecode
                    tup = [_mle_eval_ints([row[i] for row in image], rho_s)
                           for i in range(len(BC_VALUE_COLS))]
                    fp_i = _fp_ints(gamma, tau, idx_eval, tup, 0)
                    fp_f = _fp_ints(gamma, tau, idx_eval, tup,
                                    ev[("if", s, "bc_fct")])
                if claims_s[li2] != fp_i or claims_s[li2 + 1] != fp_f:
                    return False
                i_prod = proof.if_products[s].products[li2]
                f_prod = proof.if_products[s].products[li2 + 1]
                prods_if[(kind, key)] = (i_prod, f_prod)
                li2 += 2
            prods_if[("rho", s)] = rho_s

        # multiset equality per logical memory
        for kind, key, size in logical:
            r_p, w_p = prods_rw[(kind, key)]
            i_p, f_p = prods_if[(kind, key)]
            if r_p * f_p % MOD != w_p * i_p % MOD:
                return False

        # rw claims enter the batched opening
        for nm in _rw_claim_names(instr_names):
            need("rw", nm, rho_rw)

        # 3. uniform Spartan
        openings = {nm: ev[("rt", nm)] for nm in cs.committed}
        ok, r_t, shift_z, shift_finals = US.verify(ht, cs, proof.spartan, n,
                                                   openings)
        if not ok:
            return False
        for nm in cs.committed:
            need("rt", nm, r_t)
        for cname, fin in zip(US.SHIFT_COLS, shift_finals):
            if ev[("shift", cname)] != fin:
                return False
            need("shift", cname, shift_z)
        # execution starts at the program entry (sequence-entry row at
        # code_base) — checked as fixed-point opening claims at t = 0
        if ev[("t0", "cf_ventry")] != 1 or \
                ev[("t0", "bc_pc")] != proof.code_base:
            return False
        t0 = [0] * log_n
        need("t0", "cf_ventry", t0)
        need("t0", "bc_pc", t0)

        # 4. the single trace-domain opening proof
        comm_list = []
        # rebuild the claim->commitment pairing in the same canonical order
        claim_cols = ([f"flag_{nm}" for nm in instr_names]
                      + [f"E_{s}_{c}" for s, c in mems] + ["lookup_out"]
                      + _rw_claim_names(instr_names)
                      + list(cs.committed) + list(US.SHIFT_COLS)
                      + ["cf_ventry", "bc_pc"])
        for nm in claim_cols:
            comm_list.append(pst13.Commitment(proof.comms[nm]))
        if len(comm_list) != len(t_claims):
            return False
        if not OA.verify(ht, t_claims, comm_list, proof.t_opening, srs):
            return False

        # 5. per-size init/final openings
        for s in sizes:
            for nm in m_order[s]:
                ht.absorb(ev[("if", s, nm)])
            eta = ht.challenge()
            vals = [ev[("if", s, nm)] for nm in m_order[s]]
            agg = pst13.aggregate_evals_ints(eta, vals)
            cms = [pst13.Commitment(proof.comms[("m", s, nm)])
                   for nm in m_order[s]]
            if not pst13.batch_verify(srs, cms, vals, eta,
                                      prods_if[("rho", s)], agg,
                                      proof.m_openings[s]):
                return False

        # 6. JoltDevice output claim: ram_final(r_low, 1..1) must equal the
        # MLE of the revealed outputs at r_low (the output subcube)
        if proof.out_bits is not None:
            ob, mb = proof.out_bits, proof.mem_bits
            r_low = ht.challenges(ob)
            pt = r_low + [1] * (mb - ob)
            v_out = _mle_eval_ints(list(proof.outputs), r_low)
            ram_cm = pst13.Commitment(
                proof.comms[("m", 1 << mb, "ram_final")])
            if not pst13.verify(srs, ram_cm, pt, v_out,
                                proof.out_opening):
                return False
            ht.absorb(v_out)
    except (KeyError, ValueError, IndexError):
        return False
    return True
