"""Circuit frontend: JSON circuit format + Noir artifact ingestion surface.

Maps noir-r1cs (SURVEY.md §2.7): the reference compiles Noir ``ProgramArtifact``
ACIR into R1CS (AssertZero -> mul-term decomposition + one linear row,
noir_to_r1cs.rs:72-133) and solves witnesses row by row.

This module provides:
- the canonical JSON circuit format (``load_circuit_json``) mirroring the
  post-compilation R1CS builder state — the stable interchange point;
- ``compile_assert_zero``: the same AssertZero decomposition the reference
  performs (each mul term gets an aux wire + product constraint; the
  remaining linear combination becomes one linear row);
- ``load_noir_artifact``: recognizes Noir ProgramArtifact JSON (base64
  gzip bincode ACIR) — full bincode ACIR decoding is staged for a later
  round; the entry point validates the container and reports actionable
  errors meanwhile.
"""

from __future__ import annotations

import base64
import gzip
import json

from .r1cs import MOD, R1CSBuilder


def compile_assert_zero(builder: R1CSBuilder, mul_terms, linear_terms, q_c):
    """AssertZero(expr) -> R1CS rows (noir_to_r1cs.rs:72-119 behavior).

    expr = sum mul_terms (q, w_l, w_r) * w_l * w_r
         + sum linear_terms (q, w) * w + q_c  == 0

    Each mul term allocates an aux wire with a product constraint; the final
    row asserts the full linear combination is zero.
    """
    lin = [(int(q) % MOD, w) for q, w in linear_terms]
    for q, wl, wr in mul_terms:
        aux = builder.new_wire()
        builder.add_constraint([(1, wl)], [(1, wr)], [(1, aux)])
        lin.append((int(q) % MOD, aux))
    if int(q_c) % MOD:
        lin.append((int(q_c) % MOD, 0))
    # lin == 0  <=>  (lin) * (1) = (0)
    builder.add_constraint(lin, [(1, 0)], [])


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


def load_noir_artifact(path: str):
    """Ingest a Noir ProgramArtifact JSON (nargo compile output).

    Currently validates the container and decompresses the ACIR payload;
    bincode ACIR struct decoding lands in a subsequent round (tracked in
    PROGRESS notes). Raises NotImplementedError with the payload size so
    callers can fall back to the JSON circuit format.
    """
    with open(path) as f:
        art = json.load(f)
    if "bytecode" not in art:
        raise ValueError("not a Noir ProgramArtifact: missing 'bytecode'")
    blob = base64.b64decode(art["bytecode"])
    try:
        acir = gzip.decompress(blob)
    except OSError:
        acir = blob
    raise NotImplementedError(
        f"Noir ACIR bincode decoding staged for a later round "
        f"({len(acir)} bytes of ACIR); export the circuit to the JSON "
        f"format documented in load_circuit_json meanwhile"
    )
