"""ACIR bincode decoder: real nargo ``ProgramArtifact`` ingestion.

Decodes the ``bytecode`` field of a Noir ProgramArtifact (base64 + gzip +
legacy-bincode ``acir::circuit::Program``) into the opcode list the R1CS
compiler consumes — maps noir-r1cs's dependency on the ``acir`` crate and
``noir_to_r1cs``'s opcode walk (noir_to_r1cs.rs:20-133). Layout verified
against the reference's committed nargo artifacts
(noir-examples/noir-passport-examples/*.json, noir 1.0.0-beta.1):

- legacy bincode: u64 LE lengths, u32 LE enum variant tags, u8 Option tags;
- ``FieldElement`` serializes as a length-prefixed hex STRING;
- ``Witness`` is u32.

Only ``AssertZero`` expressions produce constraints (like the reference);
``BrilligCall`` / ``BlackBoxFuncCall::RANGE`` etc. are structurally parsed
so the stream stays aligned, and recorded so callers can report which
unconstrained features a circuit relies on.
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class Expression(NamedTuple):
    mul_terms: list         # [(coeff_int, w_l, w_r)]
    linear: list            # [(coeff_int, w)]
    q_c: int


class Circuit(NamedTuple):
    current_witness_index: int
    assert_zero: list       # [Expression]
    other_opcodes: list     # [(kind_str, info)] — non-constraint opcodes
    private_parameters: list
    public_parameters: list
    return_values: list


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.p = 0

    def u8(self) -> int:
        v = self.b[self.p]
        self.p += 1
        return v

    def u32(self) -> int:
        v = struct.unpack_from("<I", self.b, self.p)[0]
        self.p += 4
        return v

    def u64(self) -> int:
        v = struct.unpack_from("<Q", self.b, self.p)[0]
        self.p += 8
        return v

    def field(self) -> int:
        n = self.u64()
        s = self.b[self.p : self.p + n].decode()
        self.p += n
        return int(s, 16) if s else 0

    def expression(self) -> Expression:
        muls = []
        for _ in range(self.u64()):
            q = self.field()
            muls.append((q, self.u32(), self.u32()))
        lins = []
        for _ in range(self.u64()):
            q = self.field()
            lins.append((q, self.u32()))
        return Expression(mul_terms=muls, linear=lins, q_c=self.field())

    def function_input(self):
        tag = self.u32()
        if tag == 0:            # Constant(F)
            v = ("const", self.field())
        elif tag == 1:          # Witness(u32)
            v = ("wit", self.u32())
        else:
            raise ValueError(f"FunctionInput tag {tag}")
        return v, self.u32()    # (value, num_bits)

    def opt_expression(self):
        return self.expression() if self.u8() else None


# BlackBoxFuncCall variant ids observed/known for acir @ noir 1.0.0-beta.1
# (acir/src/circuit/opcodes/black_box_function_call.rs enum order)
_BB_AES128 = 0
_BB_AND = 1
_BB_XOR = 2
_BB_RANGE = 3
_BB_BLAKE2S = 4
_BB_BLAKE3 = 5


_BB_ECDSA_K1 = 6
_BB_ECDSA_R1 = 7
_BB_MSM = 8
_BB_EC_ADD = 9
_BB_KECCAKF = 10
_BB_RECURSION = 11
_BB_POSEIDON2 = 18
_BB_SHA256_COMPRESS = 19


def _skip_blackbox(r: _Reader, variant: int):
    """Parse (to skip) BlackBox payloads so the stream stays aligned.
    Returns a (kind, info) record; the R1CS compiler rejects circuits whose
    black boxes it cannot constrain (same scope as noir_to_r1cs.rs:121-133,
    which bails on everything but AssertZero/BrilligCall)."""
    def fis():
        return [r.function_input() for _ in range(r.u64())]

    def wits():
        return [r.u32() for _ in range(r.u64())]

    if variant == _BB_RANGE:
        inp, bits = r.function_input()
        return ("range", (inp, bits))
    if variant in (_BB_AND, _BB_XOR):
        lhs = r.function_input()
        rhs = r.function_input()
        out = r.u32()
        return ("and" if variant == _BB_AND else "xor", (lhs, rhs, out))
    if variant in (_BB_AES128, _BB_BLAKE2S, _BB_BLAKE3):
        ins = fis()
        outs = wits()
        return ("hash", (variant, ins, outs))
    if variant == _BB_MSM:
        points = fis()
        scalars = fis()
        outs = (r.u32(), r.u32(), r.u32())
        return ("msm", (points, scalars, outs))
    if variant == _BB_EC_ADD:
        in1 = [r.function_input() for _ in range(3)]
        in2 = [r.function_input() for _ in range(3)]
        outs = (r.u32(), r.u32(), r.u32())
        return ("ec_add", (in1, in2, outs))
    if variant == _BB_KECCAKF:
        # fixed-size arrays serialize WITHOUT length prefixes
        ins = [r.function_input() for _ in range(25)]
        outs = [r.u32() for _ in range(25)]
        return ("keccakf", (ins, outs))
    if variant == _BB_RECURSION:
        vk = fis()
        prf = fis()
        pub = fis()
        key_hash = r.function_input()
        ptype = r.u32()
        return ("recursion", (len(vk), len(prf), len(pub)))
    if variant == _BB_POSEIDON2:
        ins = fis()
        outs = wits()
        ln = r.u32()
        return ("poseidon2", (ins, outs, ln))
    if variant == _BB_SHA256_COMPRESS:
        # Box<[FunctionInput; 16]> / [; 8] — fixed arrays, no length prefix
        ins = [r.function_input() for _ in range(16)]
        hv = [r.function_input() for _ in range(8)]
        outs = [r.u32() for _ in range(8)]
        return ("sha256_compress", (ins, hv, outs))
    raise NotImplementedError(f"BlackBoxFuncCall variant {variant}")


def _brillig_inputs(r: _Reader):
    out = []
    for _ in range(r.u64()):
        tag = r.u32()
        if tag == 0:            # Single(Expression)
            out.append(("single", r.expression()))
        elif tag == 1:          # Array(Vec<Expression>)
            out.append(("array", [r.expression() for _ in range(r.u64())]))
        elif tag == 2:          # MemoryArray(BlockId)
            out.append(("memarray", r.u32()))
        else:
            raise ValueError(f"BrilligInputs tag {tag}")
    return out


def _brillig_outputs(r: _Reader):
    out = []
    for _ in range(r.u64()):
        tag = r.u32()
        if tag == 0:            # Simple(Witness)
            out.append(("simple", r.u32()))
        elif tag == 1:          # Array(Vec<Witness>)
            out.append(("array", [r.u32() for _ in range(r.u64())]))
        else:
            raise ValueError(f"BrilligOutputs tag {tag}")
    return out


def _witness_set(r: _Reader):
    return [r.u32() for _ in range(r.u64())]


def decode_program(acir_bytes: bytes) -> Circuit:
    """Decode function 0 of an ACIR Program (the inlined main)."""
    r = _Reader(acir_bytes)
    n_functions = r.u64()
    if n_functions < 1:
        raise ValueError("ACIR program has no functions")
    cwi = r.u32()
    assert_zero, others = [], []
    n_ops = r.u64()
    for _ in range(n_ops):
        var = r.u32()
        if var == 0:            # AssertZero
            assert_zero.append(r.expression())
        elif var == 1:          # BlackBoxFuncCall
            others.append(_skip_blackbox(r, r.u32()))
        elif var == 2:          # MemoryOp { block_id, op: MemOp, predicate }
            block = r.u32()
            op = (r.expression(), r.expression(), r.expression())
            pred = r.opt_expression()
            others.append(("memory_op", (block, op, pred)))
        elif var == 3:          # MemoryInit { block_id, init, block_type }
            block = r.u32()
            init = [r.u32() for _ in range(r.u64())]
            btype = r.u32()
            others.append(("memory_init", (block, init, btype)))
        elif var == 4:          # BrilligCall { id, inputs, outputs, predicate }
            ident = r.u32()
            ins = _brillig_inputs(r)
            outs = _brillig_outputs(r)
            pred = r.opt_expression()
            others.append(("brillig", (ident, ins, outs, pred)))
        elif var == 5:          # Call { id, inputs, outputs, predicate }
            ident = r.u32()
            ins = [r.u32() for _ in range(r.u64())]
            outs = [r.u32() for _ in range(r.u64())]
            pred = r.opt_expression()
            others.append(("call", (ident, ins, outs, pred)))
        else:
            raise NotImplementedError(f"ACIR opcode variant {var}")
    # expression_width: enum { Unbounded, Bounded { width: u64 } }
    ew = r.u32()
    if ew == 1:
        r.u64()
    private_params = _witness_set(r)
    public_params = _witness_set(r)
    return_values = _witness_set(r)
    # assert_messages / subsequent functions / brillig bytecode are not
    # needed for constraint generation and are left unparsed.
    return Circuit(
        current_witness_index=cwi,
        assert_zero=assert_zero,
        other_opcodes=others,
        private_parameters=private_params,
        public_parameters=public_params,
        return_values=return_values,
    )
