"""Offline read/write memory checking (registers + RAM + bytecode).

Maps co-jolt's bytecode and read_write_memory provers (SURVEY.md §2.8:
jolt/vm/bytecode/*, jolt/vm/read_write_memory/*): every access is a
read-modify-write with a per-address counter; multiset equality

    prod fp(RS) * prod fp(final) == prod fp(WS) * prod fp(init)

over fingerprints fp(a, v, t) = gamma^2 t + gamma v + a - tau proves the
trace of operations is consistent with the initial memory image. The two
grand products run on the batched GKR engine; final GKR claims are linear
in the committed polynomials (addr, v_read, v_write, read_ct / v_final,
final_ct), so they reduce to batched PST13 openings.

One ``MemoryTrace`` instance covers: the register file (32 addresses,
3 ops/step), RAM (loads/stores), and bytecode fetch (read-only: v_write =
v_read, public init image = the program).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ...ops import field as F
from ...ops import grand_product as GP
from ...ops import poly as P
from ...ops import pst13
from ...ops import sumcheck as SC
from ...ops import transcript as T
from ...ops.field import FR

MOD = FR.modulus


class MemoryTrace(NamedTuple):
    """Host-side description of one checked memory."""

    name: str
    mem_bits: int               # address space = 2^mem_bits
    ops: list                   # [(addr, v_read, v_write)] ints
    init_vals: list             # [2^mem_bits] ints (public image)


class MemoryWitness(NamedTuple):
    name: str
    mem_bits: int
    n: int                      # padded op count
    addrs: jnp.ndarray          # [n, 16]
    v_read: jnp.ndarray
    v_write: jnp.ndarray
    read_cts: jnp.ndarray
    v_final: jnp.ndarray        # [M, 16]
    final_cts: jnp.ndarray
    init_vals: list             # public ints (verifier recomputes its MLE)


class MemoryProof(NamedTuple):
    comms: dict                 # name -> (x, y): addr, v_read, v_write,
                                # read_ct, v_final, final_ct per instance
    rw_products: GP.GrandProductProof
    if_products: GP.GrandProductProof
    evals_rw: dict
    evals_if: dict
    proof_rw: pst13.OpeningProof
    proof_if: pst13.OpeningProof


def build_witness(trace: MemoryTrace) -> MemoryWitness:
    """Sequential replay: counters + final image. Padding ops touch addr 0."""
    m_size = 1 << trace.mem_bits
    n_real = len(trace.ops)
    n = max(4, 1 << (max(n_real - 1, 1)).bit_length())
    mem = {i: v % MOD for i, v in enumerate(trace.init_vals)}
    counts = {}
    addrs, v_read, v_write, read_cts = [], [], [], []
    for addr, vr, vw in trace.ops:
        assert 0 <= addr < m_size
        cur = mem.get(addr, 0)
        assert cur == vr % MOD, (trace.name, addr, cur, vr)
        addrs.append(addr)
        v_read.append(vr % MOD)
        v_write.append(vw % MOD)
        t = counts.get(addr, 0)
        read_cts.append(t)
        counts[addr] = t + 1
        mem[addr] = vw % MOD
    for _ in range(n - n_real):  # padding: read-write-back of address 0
        cur = mem.get(0, 0)
        addrs.append(0)
        v_read.append(cur)
        v_write.append(cur)
        t = counts.get(0, 0)
        read_cts.append(t)
        counts[0] = t + 1
    v_final = [mem.get(i, 0) for i in range(m_size)]
    final_cts = [counts.get(i, 0) for i in range(m_size)]
    return MemoryWitness(
        name=trace.name,
        mem_bits=trace.mem_bits,
        n=n,
        addrs=F.from_int(FR, addrs),
        v_read=F.from_int(FR, v_read),
        v_write=F.from_int(FR, v_write),
        read_cts=F.from_int(FR, read_cts),
        v_final=F.from_int(FR, v_final),
        final_cts=F.from_int(FR, final_cts),
        init_vals=[v % MOD for v in trace.init_vals],
    )


_TRACE_KEYS = ("addr", "v_read", "v_write", "read_ct")
_MEM_KEYS = ("v_final", "final_ct")


def _tables(wit: MemoryWitness):
    return {
        "addr": wit.addrs, "v_read": wit.v_read, "v_write": wit.v_write,
        "read_ct": wit.read_cts, "v_final": wit.v_final,
        "final_ct": wit.final_cts,
    }


def _fp(gamma, tau, a, v, t):
    g2 = F.mul(FR, gamma, gamma)
    acc = F.mul(FR, jnp.broadcast_to(g2, t.shape), t)
    acc = F.add(FR, acc, F.mul(FR, jnp.broadcast_to(gamma, v.shape), v))
    acc = F.add(FR, acc, a)
    return F.sub(FR, acc, jnp.broadcast_to(tau, acc.shape))


LABEL = b"co_zkvms_tpu/rw_memory/v1"


def prove(wits: list, srs: pst13.SRS) -> MemoryProof:
    """Prove a batch of memory instances.

    All instances must share the padded op count and mem_bits (the GKR
    batches are rectangular); callers pad traces/memories to the maxima.
    """
    assert len({w.n for w in wits}) == 1
    assert len({w.mem_bits for w in wits}) == 1
    ht = T.HostTranscript(LABEL)
    comms = {}
    wkeys = [(w.name, key, tabs[key])
             for w, tabs in ((w, _tables(w)) for w in wits)
             for key in _TRACE_KEYS + _MEM_KEYS]
    for (wn, key, _), cm in zip(
            wkeys, pst13.commit_batch(srs, [t for _, _, t in wkeys])):
        comms[(wn, key)] = cm
        ht.absorb_point(cm.xy)

    gamma_i, tau_i = ht.challenges(2)
    gamma, tau = F.from_int(FR, gamma_i), F.from_int(FR, tau_i)

    rw_leaves, if_leaves = [], []
    one = F.ones_mont(FR)
    for w in wits:
        wc = F.add(FR, w.read_cts, jnp.broadcast_to(one, w.read_cts.shape))
        rw_leaves.append(_fp(gamma, tau, w.addrs, w.v_read, w.read_cts))
        rw_leaves.append(_fp(gamma, tau, w.addrs, w.v_write, wc))
        m_size = 1 << w.mem_bits
        addr_m = F.from_int(FR, list(range(m_size)))
        init_t = F.from_int(FR, w.init_vals + [0] * (m_size - len(w.init_vals)))
        zeros = jnp.zeros_like(w.final_cts)
        if_leaves.append(_fp(gamma, tau, addr_m, init_t, zeros))
        if_leaves.append(_fp(gamma, tau, addr_m, w.v_final, w.final_cts))

    state = ht.device_state()
    state, rw_proof, rho_rw, _ = GP.prove_batched(state, jnp.stack(rw_leaves))
    state, if_proof, rho_if, _ = GP.prove_batched(state, jnp.stack(if_leaves))
    ht.state = T.HostTranscript.from_device_state(state).state

    evals_rw, evals_if = {}, {}
    rw_list, if_list = [], []
    for w in wits:
        tabs = _tables(w)
        for key in _TRACE_KEYS:
            evals_rw[(w.name, key)] = int(
                F.to_int(FR, P.evaluate(FR, tabs[key], rho_rw))
            )
            rw_list.append(tabs[key])
        for key in _MEM_KEYS:
            evals_if[(w.name, key)] = int(
                F.to_int(FR, P.evaluate(FR, tabs[key], rho_if))
            )
            if_list.append(tabs[key])
    for k in sorted(evals_rw):
        ht.absorb(evals_rw[k])
    eta_rw = ht.challenge()
    _, proof_rw = pst13.batch_open(srs, rw_list, F.from_int(FR, eta_rw), rho_rw)
    for k in sorted(evals_if):
        ht.absorb(evals_if[k])
    eta_if = ht.challenge()
    _, proof_if = pst13.batch_open(srs, if_list, F.from_int(FR, eta_if), rho_if)

    return MemoryProof(
        comms={k: v.xy for k, v in comms.items()},
        rw_products=rw_proof,
        if_products=if_proof,
        evals_rw=evals_rw,
        evals_if=evals_if,
        proof_rw=proof_rw,
        proof_if=proof_if,
    )


def verify(proof: MemoryProof, instances, srs: pst13.SRS) -> bool:
    """``instances``: [(name, mem_bits, init_vals)] public descriptions."""
    ht = T.HostTranscript(LABEL)
    names = [nm for nm, _, _ in instances]
    for nm, _, _ in instances:
        for key in _TRACE_KEYS + _MEM_KEYS:
            if (nm, key) not in proof.comms:
                return False
            ht.absorb_point(proof.comms[(nm, key)])
    gamma, tau = ht.challenges(2)

    try:
        rho_rw, claims_rw = GP.verify_batched(proof.rw_products, ht)
        rho_if, claims_if = GP.verify_batched(proof.if_products, ht)
    except ValueError:
        return False

    for i in range(len(names)):
        rs_p = proof.rw_products.products[2 * i]
        ws_p = proof.rw_products.products[2 * i + 1]
        init_p = proof.if_products.products[2 * i]
        fin_p = proof.if_products.products[2 * i + 1]
        if rs_p * fin_p % MOD != ws_p * init_p % MOD:
            return False

    ev = proof.evals_rw
    for i, nm in enumerate(names):
        a_v = ev[(nm, "addr")]
        r_v = ev[(nm, "v_read")]
        w_v = ev[(nm, "v_write")]
        t_v = ev[(nm, "read_ct")]
        fp_r = (gamma * gamma % MOD * t_v + gamma * r_v + a_v - tau) % MOD
        fp_w = (gamma * gamma % MOD * (t_v + 1) + gamma * w_v + a_v - tau) % MOD
        if claims_rw[2 * i] != fp_r or claims_rw[2 * i + 1] != fp_w:
            return False

    evf = proof.evals_if
    for i, (nm, mem_bits, init_vals) in enumerate(instances):
        idx_eval = sum((1 << b) * rho_if[b] for b in range(mem_bits)) % MOD
        # public init image MLE (verifier-side O(M))
        init_eval = 0
        eq_tab = _eq_table_ints(rho_if[:mem_bits])
        for a, v in enumerate(init_vals):
            init_eval = (init_eval + (v % MOD) * eq_tab[a]) % MOD
        f_v = evf[(nm, "v_final")]
        ft_v = evf[(nm, "final_ct")]
        fp_i = (gamma * init_eval + idx_eval - tau) % MOD
        fp_f = (gamma * gamma % MOD * ft_v + gamma * f_v + idx_eval - tau) % MOD
        if claims_if[2 * i] != fp_i or claims_if[2 * i + 1] != fp_f:
            return False

    rw_list, if_list, rw_evs, if_evs = [], [], [], []
    for nm in names:
        for key in _TRACE_KEYS:
            rw_list.append(pst13.Commitment(proof.comms[(nm, key)]))
            rw_evs.append(ev[(nm, key)])
        for key in _MEM_KEYS:
            if_list.append(pst13.Commitment(proof.comms[(nm, key)]))
            if_evs.append(evf[(nm, key)])
    for k in sorted(proof.evals_rw):
        ht.absorb(proof.evals_rw[k])
    eta_rw = ht.challenge()
    agg_rw = pst13.aggregate_evals_ints(eta_rw, rw_evs)
    if not pst13.batch_verify(srs, rw_list, rw_evs, eta_rw, rho_rw, agg_rw,
                              proof.proof_rw):
        return False
    for k in sorted(proof.evals_if):
        ht.absorb(proof.evals_if[k])
    eta_if = ht.challenge()
    agg_if = pst13.aggregate_evals_ints(eta_if, if_evs)
    return pst13.batch_verify(srs, if_list, if_evs, eta_if, rho_if, agg_if,
                              proof.proof_if)


def _eq_table_ints(point):
    table = [1]
    for r in point:
        lo = [t * (1 - r) % MOD for t in table]
        hi = [t * r % MOD for t in table]
        table = lo + hi
    return table


# --- trace extraction helpers (bridge from the RV32I emulator) --------------


def register_ops_from_trace(trace):
    """Register-file ops: rs1 read, rs2 read, rd write per step."""
    regs = [0] * 32
    ops = []
    no_rd = {"SW", "SH", "SB", "BEQ", "BNE", "BLT", "BGE", "BLTU", "BGEU"}
    for st in trace:
        ins = st.instr
        ops.append((ins.rs1, regs[ins.rs1], regs[ins.rs1]))
        ops.append((ins.rs2, regs[ins.rs2], regs[ins.rs2]))
        if ins.rd != 0 and ins.op not in no_rd:
            ops.append((ins.rd, regs[ins.rd], st.rd_post))
            regs[ins.rd] = st.rd_post
        else:
            ops.append((0, regs[0], regs[0]))
    return ops


def ram_ops_from_trace(trace, ram_base: int, mem_bits: int):
    """Word-aligned RAM ops from LW/SW steps; other steps touch slot 0."""
    ops = []
    mem = {}
    for st in trace:
        if st.instr.op == "LW" and st.mem_addr is not None:
            slot = (st.mem_addr - ram_base) // 4
            cur = mem.get(slot, 0)
            ops.append((slot, cur, cur))
        elif st.instr.op == "SW" and st.mem_addr is not None:
            slot = (st.mem_addr - ram_base) // 4
            cur = mem.get(slot, 0)
            ops.append((slot, cur, st.mem_write))
            mem[slot] = st.mem_write
        else:
            cur = mem.get(0, 0)
            ops.append((0, cur, cur))
    return ops


def bytecode_ops_from_trace(trace, program_words, base: int):
    """Read-only fetch ops: address = (pc - base)/4, value = raw word."""
    ops = []
    for st in trace:
        idx = (st.instr.address - base) // 4
        ops.append((idx, program_words[idx], program_words[idx]))
    return ops
