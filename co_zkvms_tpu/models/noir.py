"""Circuit frontend: JSON circuit format + real Noir artifact ingestion.

Maps noir-r1cs (SURVEY.md §2.7): the reference compiles Noir
``ProgramArtifact`` ACIR into R1CS (AssertZero -> mul-term decomposition +
one linear row, noir_to_r1cs.rs:72-119) and solves witnesses row by row
(r1cs.rs:83-115), with ABI/TOML input parsing (noir_witness.rs:21-57).

This module provides:

- ``load_noir_artifact``: full ingestion of a nargo ``ProgramArtifact``
  JSON — base64+gzip+bincode ACIR decode (models/acir.py), the reference's
  exact AssertZero walk with public wires (public params + return values)
  allocated into the io region, ABI retained for input mapping;
- ``solve_artifact_witness``: ABI-flatten TOML-style inputs to the ACIR
  parameter witnesses and run the fixpoint R1CS solver (the quadratic
  one-unknown rule covers the inverse/quotient values nargo delegates to
  Brillig; maps NoirProofScheme::solve_witness, noir_proof_scheme.rs:90);
- ``compile_assert_zero``: the reference decomposition — every mul term but
  the last gets an aux product wire, the last stays as the row's a*b, and
  one linear row closes the expression (noir_to_r1cs.rs:80-119);
- the canonical JSON circuit format (``load_circuit_json``) as the
  artifact-free interchange point.

Scope parity: the reference bails on every opcode except AssertZero and
BrilligCall (noir_to_r1cs.rs:121-133). ``strict=True`` reproduces that;
the default records skipped black boxes (range/poseidon2/...) in
``NoirArtifact.unconstrained`` so callers can report what a circuit relies
on that is NOT enforced by the produced R1CS.
"""

from __future__ import annotations

import base64
import gzip
import json
from typing import NamedTuple

from . import acir
from .r1cs import MOD, R1CSBuilder


def compile_assert_zero(builder: R1CSBuilder, mul_terms, linear_terms, q_c):
    """AssertZero(expr) -> R1CS rows (noir_to_r1cs.rs:72-119 behavior).

    expr = sum mul_terms (q, w_l, w_r) * w_l * w_r
         + sum linear_terms (q, w) * w + q_c  == 0

    All mul terms but the last get an aux wire with a product constraint;
    the last mul term becomes the row's a*b sides and the remaining linear
    combination (negated) its c side: q_k*wl*wr = -(rest).
    """
    a_side, b_side, lin = [], [], []
    for q, wl, wr in mul_terms[:-1]:
        aux = builder.new_wire()
        builder.add_constraint([(1, wl)], [(1, wr)], [(1, aux)])
        lin.append((-int(q) % MOD, aux))
    if mul_terms:
        q, wl, wr = mul_terms[-1]
        a_side = [(int(q) % MOD, wl)]
        b_side = [(1, wr)]
    lin += [(-int(q) % MOD, w) for q, w in linear_terms]
    if int(q_c) % MOD:
        lin.append((-int(q_c) % MOD, 0))
    builder.add_constraint(a_side, b_side, lin)


def load_circuit_json(path: str) -> R1CSBuilder:
    """Load the canonical JSON circuit format.

    {
      "num_public": int,            # io wires incl. the constant-1 wire
      "num_wires": int,             # optional; grown as needed
      "constraints": [ {"a": [[coeff, wire], ...], "b": ..., "c": ...} ],
      "assert_zero": [ {"mul": [[q, wl, wr], ...],
                        "linear": [[q, w], ...], "q_c": coeff} ]
    }
    Coefficients may be ints or decimal strings.
    """
    with open(path) as f:
        raw = json.load(f)
    b = R1CSBuilder(num_public=int(raw["num_public"]))
    b.num_wires = max(b.num_wires, int(raw.get("num_wires", 0)))

    def terms(lst):
        return [(int(q), int(w)) for q, w in lst]

    for c in raw.get("constraints", []):
        b.add_constraint(terms(c.get("a", [])), terms(c.get("b", [])),
                         terms(c.get("c", [])))
    for az in raw.get("assert_zero", []):
        compile_assert_zero(
            b,
            [(int(q), int(wl), int(wr)) for q, wl, wr in az.get("mul", [])],
            terms(az.get("linear", [])),
            az.get("q_c", 0),
        )
    return b


class NoirArtifact(NamedTuple):
    """A compiled Noir program lowered to R1CS, ready for Spartan."""

    builder: R1CSBuilder
    witness_map: dict           # acir witness index -> r1cs wire
    abi: dict                   # the artifact's abi section verbatim
    circuit: acir.Circuit
    unconstrained: list         # [(kind, ...)] opcodes not lowered to rows

    def build(self):
        return self.builder.build()

    def solve_witness(self, inputs):
        return solve_artifact_witness(self, inputs)


def _decode_artifact_bytecode(art: dict) -> acir.Circuit:
    if "bytecode" not in art:
        raise ValueError("not a Noir ProgramArtifact: missing 'bytecode'")
    blob = base64.b64decode(art["bytecode"])
    try:
        raw = gzip.decompress(blob)
    except OSError:
        raw = blob
    return acir.decode_program(raw)


def load_noir_artifact(path: str, strict: bool = False) -> NoirArtifact:
    """Ingest a Noir ProgramArtifact JSON (nargo compile output).

    Builds R1CS from the AssertZero opcodes via the reference walk.
    Public wires (public parameters, then return values, ACIR order) are
    allocated first so they land in the io region z[1..num_public); all
    other ACIR witnesses get wires on first use (noir_to_r1cs.rs:60-69).

    ``strict=True`` raises on any opcode besides AssertZero/BrilligCall,
    matching noir_to_r1cs.rs:121-133 exactly; the default skips black
    boxes and records them in ``unconstrained``.
    """
    with open(path) as f:
        art = json.load(f)
    circuit = _decode_artifact_bytecode(art)

    pub_wits = list(circuit.public_parameters)
    for w in circuit.return_values:
        if w not in circuit.public_parameters:
            pub_wits.append(w)
    builder = R1CSBuilder(num_public=1 + len(pub_wits))
    witness_map = {}
    for i, w in enumerate(pub_wits):
        witness_map[w] = 1 + i

    def wire(acir_w: int) -> int:
        r = witness_map.get(acir_w)
        if r is None:
            r = builder.new_wire()
            witness_map[acir_w] = r
        return r

    unconstrained = []
    for kind, info in circuit.other_opcodes:
        if kind == "brillig":
            continue            # witness generation only, like the reference
        if strict:
            raise ValueError(f"unsupported opcode for strict R1CS: {kind}")
        unconstrained.append((kind, info))

    for expr in circuit.assert_zero:
        compile_assert_zero(
            builder,
            [(q, wire(wl), wire(wr)) for q, wl, wr in expr.mul_terms],
            [(q, wire(w)) for q, w in expr.linear],
            expr.q_c,
        )

    return NoirArtifact(
        builder=builder,
        witness_map=witness_map,
        abi=art.get("abi", {}),
        circuit=circuit,
        unconstrained=unconstrained,
    )


# --- ABI input flattening (maps noir_witness.rs:21-57 / noirc_abi) ---------


def _flatten_abi_value(abi_type: dict, value, out: list):
    kind = abi_type["kind"]
    if kind in ("field", "integer", "boolean"):
        if isinstance(value, str):
            v = int(value, 16) if value.startswith("0x") else int(value)
        elif isinstance(value, bool):
            v = int(value)
        else:
            v = int(value)
        out.append(v % MOD)
    elif kind == "string":
        s = value if isinstance(value, str) else str(value)
        if len(s) != int(abi_type["length"]):
            raise ValueError(
                f"string input length {len(s)} != {abi_type['length']}")
        out.extend(ord(ch) for ch in s)
    elif kind == "array":
        if len(value) != int(abi_type["length"]):
            raise ValueError(
                f"array input length {len(value)} != {abi_type['length']}")
        for v in value:
            _flatten_abi_value(abi_type["type"], v, out)
    elif kind == "struct":
        for fld in abi_type["fields"]:
            _flatten_abi_value(fld["type"], value[fld["name"]], out)
    elif kind == "tuple":
        for ty, v in zip(abi_type["fields"], value):
            _flatten_abi_value(ty, v, out)
    else:
        raise NotImplementedError(f"ABI type kind {kind}")


def abi_flatten_inputs(abi: dict, inputs: dict) -> list:
    """Flatten named inputs to field values in parameter declaration order —
    exactly the order nargo assigns ACIR witnesses 0..n-1 to ``main``'s
    parameters (verified against the reference's passport artifacts)."""
    out = []
    for param in abi.get("parameters", []):
        name = param["name"]
        if name not in inputs:
            raise ValueError(f"missing input {name!r}")
        _flatten_abi_value(param["type"], inputs[name], out)
    return out


def solve_artifact_witness(artifact: NoirArtifact, inputs: dict):
    """ABI inputs -> full R1CS witness z via the fixpoint solver.

    Parameter witnesses seed the solve; every remaining wire (including the
    io-region return values) must be derivable from the constraint rows.
    """
    flat = abi_flatten_inputs(artifact.abi, inputs)
    assignments = {}
    for acir_w, v in enumerate(flat):
        r1cs_w = artifact.witness_map.get(acir_w)
        if r1cs_w is not None:
            assignments[r1cs_w] = v
    return artifact.builder.solve_witness(None, assignments)


def load_prover_toml(path: str) -> dict:
    """Parse a nargo Prover.toml into the inputs dict the ABI mapper takes."""
    import tomllib

    with open(path, "rb") as f:
        return tomllib.load(f)
