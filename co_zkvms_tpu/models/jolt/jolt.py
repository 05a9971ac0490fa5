"""Jolt zkVM top-level prover: trace -> {instruction lookups, memory checks}.

Composes the subsystem provers over one RV32I execution trace, mirroring the
reference's ``Jolt::prove`` orchestration (jolt/vm/jolt/mod.rs:293-484:
bytecode -> instruction lookups -> read/write memory -> [uniform Spartan] ->
[opening reduction]):

- instruction lookups (models/jolt/lasso.py) over the trace's lookup queries;
- offline memory checking (models/jolt/rw_memory.py) for the register file,
  RAM, and bytecode fetch.

Round-1 scope note: the uniform-Spartan R1CS that ties the subsystems'
operands together (pc progression, rs1_val/rs2_val consistency between the
register file and the lookup operands) and the cross-poly opening reduction
are staged next (PROGRESS.md); each subsystem proof is individually sound
against its own commitments.
"""

from __future__ import annotations

from typing import NamedTuple

from ...ops import pst13
from . import instructions as INS
from . import lasso
from . import rv32i as rv
from . import rw_memory as RW

RAM_BASE = 0x1000_0000
CODE_BASE = 0x8000_0000


class JoltProof(NamedTuple):
    lasso_proof: lasso.LassoProof
    memory_proof: RW.MemoryProof
    instr_names: tuple
    log_n: int
    mem_instances: tuple        # ((name, mem_bits, init_vals_tuple), ...)


def lookup_queries_from_trace(trace):
    """Extract (instr, x, y, out) lookup queries for supported ops."""
    queries = []
    for st in trace:
        name = INS.TRACER_TO_LOOKUP.get(st.instr.op)
        if name is None:
            continue
        queries.append((name, st.rs1_val, st.rs2_val, st.lookup_output))
    return queries


def prove(program_words, srs: pst13.SRS, mem_bits: int = 8,
          max_steps: int = 1 << 12, memory=None) -> JoltProof:
    """Trace the guest and prove all subsystems."""
    emu = rv.Emulator(program_words, base=CODE_BASE, memory=memory,
                      max_steps=max_steps)
    trace = emu.run()

    queries = lookup_queries_from_trace(trace)
    instr_names = tuple(sorted({q[0] for q in queries}))
    wit = lasso.build_witness(queries, instr_names=instr_names)
    lasso_proof = lasso.prove(wit, srs)

    reg_ops = RW.register_ops_from_trace(trace)
    ram_ops = RW.ram_ops_from_trace(trace, RAM_BASE, mem_bits)
    byte_ops = RW.bytecode_ops_from_trace(trace, program_words, CODE_BASE)
    m = 1 << mem_bits
    traces = [
        RW.MemoryTrace("regs", mem_bits, reg_ops, [0] * m),
        RW.MemoryTrace("ram", mem_bits, ram_ops, [0] * m),
        RW.MemoryTrace("bytecode", mem_bits, byte_ops,
                       list(program_words) + [0] * (m - len(program_words))),
    ]
    n_max = max(len(t.ops) for t in traces)
    wits = []
    for t in traces:
        cur = t.init_vals[0] if t.init_vals else 0
        for a, _, vw in t.ops:
            if a == 0:
                cur = vw
        ops = list(t.ops) + [(0, cur, cur)] * (n_max - len(t.ops))
        wits.append(RW.build_witness(
            RW.MemoryTrace(t.name, t.mem_bits, ops, t.init_vals)
        ))
    memory_proof = RW.prove(wits, srs)

    return JoltProof(
        lasso_proof=lasso_proof,
        memory_proof=memory_proof,
        instr_names=instr_names,
        log_n=wit.n.bit_length() - 1,
        mem_instances=tuple(
            (t.name, t.mem_bits, tuple(t.init_vals)) for t in traces
        ),
    )


def verify(proof: JoltProof, srs: pst13.SRS) -> bool:
    if not lasso.verify(proof.lasso_proof, proof.instr_names, proof.log_n, srs):
        return False
    instances = [(nm, mb, list(iv)) for nm, mb, iv in proof.mem_instances]
    return RW.verify(proof.memory_proof, instances, srs)
