"""Jolt zkVM end-to-end: trace a guest program, prove all subsystems, verify."""

import pytest

from co_zkvms_tpu.models.jolt import jolt, rv32i as rv, subtables as ST
from co_zkvms_tpu.ops import pst13


@pytest.fixture(autouse=True, scope="module")
def small_tables():
    ST.set_config(4)   # 8-bit operand mini geometry for CPU tests
    yield
    ST.set_config(16)


@pytest.fixture(scope="module")
def srs():
    return pst13.setup_cached(8, seed=21)


def guest_program():
    """Small arithmetic guest using only mini-geometry-safe (8-bit) values."""
    return [
        rv.asm("ADDI", rd=1, rs1=0, imm=17),
        rv.asm("ADDI", rd=2, rs1=0, imm=5),
        rv.asm("ADD", rd=3, rs1=1, rs2=2),     # 22
        rv.asm("AND", rd=4, rs1=3, rs2=1),
        rv.asm("XOR", rd=5, rs1=4, rs2=2),
        rv.asm("SUB", rd=6, rs1=3, rs2=2),     # 17
        rv.asm("BEQ", rs1=6, rs2=1, imm=8),    # taken -> skip next
        rv.asm("ADDI", rd=7, rs1=0, imm=99),
        rv.asm("ECALL"),
    ]


@pytest.mark.slow
def test_jolt_e2e(srs):
    prog = guest_program()
    proof = jolt.prove(prog, srs, mem_bits=6)
    assert jolt.verify(proof, srs)

    # subsystem cross-check: tampering with the lasso claims breaks verify
    bad_evals = dict(proof.lasso_proof.evals_rz)
    bad_evals[("out",)] = (bad_evals[("out",)] + 1) % pst13.FR.modulus
    bad = proof._replace(
        lasso_proof=proof.lasso_proof._replace(evals_rz=bad_evals)
    )
    assert not jolt.verify(bad, srs)
