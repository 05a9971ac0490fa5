"""Utils (tracing, serialization, config) + CLI smoke tests."""

import json
import os

import pytest

from co_zkvms_tpu.utils import serialization as ser
from co_zkvms_tpu.utils.config import MeshConfig
from co_zkvms_tpu.utils.tracing import Tracer


def test_tracing_spans(tmp_path):
    t = Tracer()
    t.enabled = True
    with t.span("outer"):
        with t.span("inner"):
            pass
    assert t.roots[0].name == "outer"
    assert t.roots[0].children[0].name == "inner"
    assert t.total("outer") >= t.total("inner")
    path = tmp_path / "trace.json"
    t.chrome_trace(str(path))
    events = json.loads(path.read_text())["traceEvents"]
    assert {e["name"] for e in events} == {"outer", "inner"}


def test_serialization_roundtrip(tmp_path):
    from co_zkvms_tpu.ops.pst13 import Commitment, OpeningProof

    obj = {
        "comm": Commitment((123, 456)),
        "proof": OpeningProof(pis=((1, 2), (3, 4))),
        "big": 2**260 + 7,
        "list": [1, 2, [3, 4]],
    }
    path = str(tmp_path / "obj.json.gz")
    ser.dump(obj, path)
    back = ser.load(path)
    assert back["comm"] == obj["comm"]
    assert back["proof"] == obj["proof"]
    assert back["big"] == obj["big"]


def test_mesh_config(tmp_path):
    cfg = MeshConfig(log_num_chunks=1, party_on_mesh=True)
    cfg.validate(8)
    with pytest.raises(ValueError):
        MeshConfig(log_num_chunks=3, party_on_mesh=True).validate(8)
    # toml load
    p = tmp_path / "cfg.toml"
    p.write_text("log_num_chunks = 2\nparty_on_mesh = false\n")
    from co_zkvms_tpu.utils import config

    loaded = config.load(str(p))
    assert loaded.n_chunks == 4
    mesh = cfg.make_mesh()
    assert dict(mesh.shape) == {"party": 3, "chunk": 2}


def test_cli_end_to_end(tmp_path):
    from co_zkvms_tpu import cli

    art = str(tmp_path / "artifacts")
    proof = str(tmp_path / "proof.json.gz")
    cli.main(["setup", "--circuit", "synthetic:4", "--artifacts", art])
    cli.main([
        "prove", "--artifacts", art, "--inputs", "3", "--out", proof,
    ])
    with pytest.raises(SystemExit) as e:
        cli.main(["verify", "--artifacts", art, "--inputs", "3",
                  "--proof", proof])
    assert e.value.code == 0
    # wrong input fails
    with pytest.raises(SystemExit) as e:
        cli.main(["verify", "--artifacts", art, "--inputs", "4",
                  "--proof", proof])
    assert e.value.code == 1


def test_circuit_json_and_assert_zero(tmp_path):
    from co_zkvms_tpu.models import noir

    # x*y - 6 == 0 with x public (wire 1), y witness solved? solver needs one
    # unknown per row: y = wire 2 via mul aux decomposition is not solver
    # friendly; use direct constraints instead
    circ = {
        "num_public": 2,
        "constraints": [
            {"a": [[1, 1]], "b": [[1, 2]], "c": [[6, 0]]},
        ],
        "num_wires": 3,
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(circ))
    b = noir.load_circuit_json(str(p))
    z = b.solve_witness([3])
    assert z == [1, 3, 2]
    # assert_zero decomposition
    circ2 = {
        "num_public": 3,  # [1, x, y]
        "assert_zero": [
            {"mul": [[1, 1, 2]], "linear": [[-1, 0]], "q_c": 0}
        ],  # x*y - 1 == 0
    }
    p2 = tmp_path / "c2.json"
    p2.write_text(json.dumps(circ2))
    b2 = noir.load_circuit_json(str(p2))
    r1cs = b2.build()
    from co_zkvms_tpu.models.r1cs import MOD

    inv3 = pow(3, -1, MOD)
    assert r1cs.check_witness_ints([1, 3, inv3, 1])
    assert not r1cs.check_witness_ints([1, 3, 5, 15])
