"""Real Noir ProgramArtifact ingestion (VERDICT missing #7).

Two layers:
1. every committed nargo artifact in the reference's noir-examples decodes
   and compiles to a consistent R1CS (the bincode layout + AssertZero walk
   are correct against real compiler output);
2. a synthetic artifact (encoded with the same legacy-bincode layout the
   decoder parses) goes end-to-end: ABI/TOML inputs -> witness solve ->
   Spartan prove -> verify, plus tamper probes.
"""

import base64
import glob
import gzip
import json
import os
import struct

import pytest

from co_zkvms_tpu.models import noir
from co_zkvms_tpu.models.r1cs import MOD

ART_DIR = ("/root/reference/co-noir-spartan/noir-r1cs/noir-examples/"
           "noir-passport-examples")


def _artifacts():
    return sorted(glob.glob(os.path.join(ART_DIR, "*.json")))


@pytest.mark.skipif(not _artifacts(), reason="reference artifacts not present")
def test_all_reference_artifacts_ingest():
    assert len(_artifacts()) >= 10
    for path in _artifacts():
        art = noir.load_noir_artifact(path)
        r1cs = art.build()
        # every AssertZero produced at least one row; aux wires were added
        assert r1cs.num_constraints >= len(art.circuit.assert_zero)
        assert r1cs.num_wires > r1cs.num_public >= 1
        # wire map is injective and in range
        wires = list(art.witness_map.values())
        assert len(set(wires)) == len(wires)
        assert all(1 <= w < r1cs.num_wires for w in wires)
        # scope parity: the reference bails on black boxes; we record them
        assert all(k != "brillig" for k, _ in art.unconstrained)


def test_strict_mode_matches_reference_scope():
    path = _artifacts()[0] if _artifacts() else None
    if path is None:
        pytest.skip("no artifacts")
    with pytest.raises(ValueError, match="unsupported opcode"):
        noir.load_noir_artifact(path, strict=True)


# --- synthetic artifact: full pipeline -------------------------------------


def _enc_field(v: int) -> bytes:
    s = f"{v:x}".encode()
    return struct.pack("<Q", len(s)) + s


def _enc_expr(muls, lins, q_c) -> bytes:
    out = struct.pack("<Q", len(muls))
    for q, wl, wr in muls:
        out += _enc_field(q) + struct.pack("<II", wl, wr)
    out += struct.pack("<Q", len(lins))
    for q, w in lins:
        out += _enc_field(q) + struct.pack("<I", w)
    return out + _enc_field(q_c)


def _make_artifact(tmp_path):
    """fn main(a: Field, b: pub Field, c: Field) -> pub Field
    { let d = a*b; assert(d + c == 10); d } — witnesses a=0 b=1 c=2 ret=3."""
    body = b""
    body += struct.pack("<Q", 1)                # 1 function
    body += struct.pack("<I", 4)                # current_witness_index
    exprs = [
        # a*b - d == 0
        _enc_expr([(1, 0, 1)], [(MOD - 1, 3)], 0),
        # d + c - 10 == 0
        _enc_expr([], [(1, 3), (1, 2)], MOD - 10),
    ]
    body += struct.pack("<Q", len(exprs))
    for e in exprs:
        body += struct.pack("<I", 0) + e        # opcode 0 = AssertZero
    body += struct.pack("<I", 0)                # ExpressionWidth::Unbounded
    body += struct.pack("<Q", 2) + struct.pack("<II", 0, 2)   # private {a,c}
    body += struct.pack("<Q", 1) + struct.pack("<I", 1)       # public {b}
    body += struct.pack("<Q", 1) + struct.pack("<I", 3)       # return {d}
    art = {
        "noir_version": "1.0.0-beta.1-synthetic",
        "abi": {
            "parameters": [
                {"name": "a", "type": {"kind": "field"},
                 "visibility": "private"},
                {"name": "b", "type": {"kind": "field"},
                 "visibility": "public"},
                {"name": "c", "type": {"kind": "field"},
                 "visibility": "private"},
            ],
            "return_type": {"abi_type": {"kind": "field"},
                            "visibility": "public"},
        },
        "bytecode": base64.b64encode(gzip.compress(body)).decode(),
    }
    p = tmp_path / "synthetic.json"
    p.write_text(json.dumps(art))
    return str(p)


def test_synthetic_artifact_roundtrip(tmp_path):
    path = _make_artifact(tmp_path)
    art = noir.load_noir_artifact(path, strict=True)   # AssertZero-only
    r1cs = art.build()
    # io region: 1 + public b + return d
    assert r1cs.num_public == 3
    z = art.solve_witness({"a": 4, "b": 2, "c": 2})
    assert r1cs.check_witness_ints(z)
    # the return wire solved to a*b
    assert z[art.witness_map[3]] == 8
    with pytest.raises(ValueError):
        art.solve_witness({"a": 4, "b": 2, "c": 3})    # 8+3 != 10


def test_synthetic_artifact_proves(tmp_path):
    from co_zkvms_tpu.models import spartan
    from co_zkvms_tpu.ops import pst13

    path = _make_artifact(tmp_path)
    art = noir.load_noir_artifact(path)
    index = spartan.SpartanIndex.from_r1cs(art.build())
    srs = pst13.setup_cached(max(index.nv + 1, 4), seed=7)
    z = art.solve_witness({"a": 4, "b": 2, "c": 2})
    proof = spartan.prove(index, srs, z)
    pub = z[1:index.r1cs.num_public]
    assert spartan.verify(index, srs, pub, proof)
    # public-input tamper fails
    assert not spartan.verify(index, srs, [pub[0] + 1, pub[1]], proof)


def test_abi_flatten_shapes():
    abi = {"parameters": [
        {"name": "xs", "type": {"kind": "array", "length": 3,
                                "type": {"kind": "integer",
                                         "sign": "unsigned", "width": 8}}},
        {"name": "s", "type": {"kind": "string", "length": 2}},
        {"name": "p", "type": {"kind": "struct", "fields": [
            {"name": "x", "type": {"kind": "field"}},
            {"name": "y", "type": {"kind": "boolean"}},
        ]}},
    ]}
    flat = noir.abi_flatten_inputs(
        abi, {"xs": [1, "0x02", 3], "s": "hi",
              "p": {"x": "11", "y": True}})
    assert flat == [1, 2, 3, ord("h"), ord("i"), 11, 1]
