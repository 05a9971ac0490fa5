"""Linked Jolt zkVM end-to-end: one cross-linked proof over a real guest.

The tamper probes are the point of this test (VERDICT round-1 item 1): any
cross-subsystem inconsistency — an operand fed to Lasso that disagrees with
the register file, a forged pc, a forged rd write-back — must break verify.
"""

import pytest

from co_zkvms_tpu.models.jolt import jolt, rv32i as rv, subtables as ST
from co_zkvms_tpu.models.jolt import uniform_spartan as US
from co_zkvms_tpu.ops import pst13

MOD = pst13.FR.modulus


@pytest.fixture(autouse=True, scope="module")
def small_tables():
    ST.set_config(8)   # 16-bit words: shifts/jumps work, tables stay small
    yield
    ST.set_config(16)


@pytest.fixture(scope="module")
def srs():
    return pst13.setup_cached(8, seed=21)


def guest_program():
    """Arithmetic + branch + memory + shift + jump + M-extension guest
    (16-bit-safe). DIV/REM exercise the virtual-sequence expansion
    (advice + validity asserts over the 64-register file)."""
    return [
        rv.asm("ADDI", rd=1, rs1=0, imm=17),
        rv.asm("ADDI", rd=2, rs1=0, imm=5),
        rv.asm("ADD", rd=3, rs1=1, rs2=2),     # r3 = 22
        rv.asm("AND", rd=4, rs1=3, rs2=1),
        rv.asm("XOR", rd=5, rs1=4, rs2=2),
        rv.asm("SUB", rd=6, rs1=3, rs2=2),     # r6 = 17
        rv.asm("SLL", rd=7, rs1=2, rs2=2),     # r7 = 5 << 5 = 160
        rv.asm("SW", rs1=0, rs2=7, imm=0x104),  # ram slot 1 <- r7
        rv.asm("LW", rd=8, rs1=0, imm=0x104),  # r8 = 160
        rv.asm("BEQ", rs1=6, rs2=1, imm=8),    # taken -> skip next
        rv.asm("ADDI", rd=9, rs1=0, imm=99),   # skipped
        rv.asm("SLT", rd=10, rs1=2, rs2=1),    # 5 < 17 -> 1
        rv.asm("DIV", rd=12, rs1=1, rs2=2),    # 17 / 5 = 3 (virtual seq)
        rv.asm("REM", rd=13, rs1=1, rs2=2),    # 17 % 5 = 2 (virtual seq)
        rv.asm("JAL", rd=11, imm=8),           # jump over next
        rv.asm("ADDI", rd=9, rs1=0, imm=77),   # skipped
        rv.asm("ECALL"),
    ]


@pytest.fixture(scope="module")
def proof_and_prog(srs):
    prog = guest_program()
    proof = jolt.prove(prog, srs, mem_bits=4)
    return proof, prog


@pytest.mark.slow
def test_jolt_linked_e2e(srs, proof_and_prog):
    proof, prog = proof_and_prog
    assert jolt.verify(proof, prog, srs)


@pytest.mark.slow
def test_jolt_rejects_wrong_program(srs, proof_and_prog):
    proof, prog = proof_and_prog
    other = list(prog)
    other[2] = rv.asm("ADD", rd=3, rs1=1, rs2=1)   # different semantics
    assert not jolt.verify(proof, other, srs)


@pytest.mark.slow
@pytest.mark.parametrize("tag,name", [
    ("rz", "lookup_out"),       # collation output
    ("rt", "rs1_val"),          # Lasso operand vs register file
    ("rt", "rd_val"),           # rd write-back linkage
    ("rt", "bc_addr"),          # pc vs bytecode
    ("rw", "ram_read"),         # RAM consistency
    ("shift", "bc_pc"),         # cross-step pc progression
    ("t0", "cf_ventry"),        # execution-start / sequence-entry pin
])
def test_jolt_rejects_tampered_claims(srs, proof_and_prog, tag, name):
    proof, prog = proof_and_prog
    bad_evals = dict(proof.evals)
    key = (tag, name)
    assert key in bad_evals
    bad_evals[key] = (bad_evals[key] + 1) % MOD
    assert not jolt.verify(proof._replace(evals=bad_evals), prog, srs)


def test_eqplus1_closed_form(rng):
    """Closed-form eqplus1(x, y) == brute-force sum over the hypercube."""
    n = 4
    x = [rng.randrange(MOD) for _ in range(n)]
    y = [rng.randrange(MOD) for _ in range(n)]

    def eq_pt(r, t):
        acc = 1
        for k in range(n):
            b = (t >> k) & 1
            acc = acc * (r[k] if b else (1 - r[k])) % MOD
        return acc

    brute = 0
    for t in range((1 << n) - 1):
        brute = (brute + eq_pt(x, t) * eq_pt(y, t + 1)) % MOD
    assert US.eqplus1_eval_ints(x, y) == brute


def test_constraint_system_builds():
    names = ("ADD", "SUB", "AND", "XOR", "SLL", "SLT", "EQ", "LTU")
    cs = US.build(names, 0x400, 0x100)
    assert cs.inputs[0] == "one"
    assert "bc_addr_next" in cs.inputs
    assert "bc_addr_next" not in cs.committed
    assert cs.k_pad >= len(cs.rows)
    # every row references only known inputs
    known = set(cs.inputs)
    for a, b, c in cs.rows:
        for lc in (a, b, c):
            assert set(lc) <= known


@pytest.mark.slow
def test_jolt_rep3_bit_identical(srs, proof_and_prog):
    """Full Rep3 MPC proving of the linked zkVM: the 3-party proof is
    bit-identical to single-party and verifies under the same verifier."""
    proof, prog = proof_and_prog
    proof3 = jolt.prove_rep3(prog, srs, mem_bits=4)
    assert proof3.evals == proof.evals
    assert proof3.comms == proof.comms
    assert proof3 == proof
    assert jolt.verify(proof3, prog, srs)


@pytest.mark.slow
def test_jolt_rep3_mpc_witness_bit_identical(srs, proof_and_prog):
    """witness_mode='mpc': lookup-layer columns generated share-side from
    ring-shared operands (a2b banks, OHV chains, scan counters) — the proof
    is STILL bit-identical to single-party (VERDICT r2 #3)."""
    proof, prog = proof_and_prog
    proof3 = jolt.prove_rep3(prog, srs, mem_bits=4, witness_mode="mpc")
    assert proof3.evals == proof.evals
    assert proof3 == proof
    assert jolt.verify(proof3, prog, srs)


@pytest.mark.slow
def test_jolt_device_io(srs):
    """JoltDevice program I/O: the guest reads public inputs from the input
    region, writes to the output region; the verifier checks the revealed
    outputs against the committed final RAM image (output-subcube opening)
    and rejects tampered outputs/inputs."""
    # out_bits=1 -> output region = top 2 slots (14, 15); inputs at slots 0,1
    prog = [
        rv.asm("LW", rd=1, rs1=0, imm=0x100),       # r1 = in[0]
        rv.asm("LW", rd=2, rs1=0, imm=0x104),       # r2 = in[1]
        rv.asm("ADD", rd=3, rs1=1, rs2=2),
        rv.asm("SUB", rd=4, rs1=1, rs2=2),
        rv.asm("SW", rs1=0, rs2=3, imm=0x100 + 4 * 14),  # out[0] = r1+r2
        rv.asm("SW", rs1=0, rs2=4, imm=0x100 + 4 * 15),  # out[1] = r1-r2
        rv.asm("ECALL"),
    ]
    proof = jolt.prove(prog, srs, mem_bits=4, inputs=[41, 17], out_bits=1)
    assert list(proof.outputs) == [58, 24]
    assert jolt.verify(proof, prog, srs, inputs=[41, 17])
    # binding: wrong expected inputs rejected
    assert not jolt.verify(proof, prog, srs, inputs=[41, 18])
    # tampered revealed output rejected
    bad = proof._replace(outputs=(59, 24))
    assert not jolt.verify(bad, prog, srs, inputs=[41, 17])
    # tampered input list rejected (init fingerprint mismatch)
    bad2 = proof._replace(inputs=(42, 17))
    assert not jolt.verify(bad2, prog, srs, inputs=[42, 17])
