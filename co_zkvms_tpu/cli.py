"""CLI: setup / prove / verify / stats (maps co-spartan + noir-r1cs CLIs).

Reference surface (SURVEY.md §2.6/2.7): ``co-spartan setup|work``,
``noir-r1cs prepare|solve-witness|verify|circuit-stats``. Here:

  python -m co_zkvms_tpu.cli setup   --circuit c.json --artifacts out/
  python -m co_zkvms_tpu.cli prove   --artifacts out/ --inputs 3,5 [--rep3]
  python -m co_zkvms_tpu.cli verify  --artifacts out/ --proof proof.json.gz
  python -m co_zkvms_tpu.cli stats   --circuit c.json

Circuits: the JSON format (models/noir.py), a Noir artifact (ingestion
surface), or ``synthetic:N`` (squaring chain with N constraints).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .utils import serialization as ser
from .utils.tracing import tracer


def _load_builder(circuit: str):
    from .models import noir, synthetic

    if circuit.startswith("synthetic:"):
        return synthetic.squaring_chain(int(circuit.split(":")[1]))
    if circuit.endswith(".json") and os.path.exists(circuit):
        with open(circuit) as f:
            head = json.load(f)
        if "bytecode" in head:
            return noir.load_noir_artifact(circuit)
        return noir.load_circuit_json(circuit)
    raise SystemExit(f"cannot load circuit {circuit!r}")


def cmd_setup(args):
    from .models import spartan, spartan_dfs
    from .ops import pst13

    b = _load_builder(args.circuit)
    r1cs = b.build()
    index = spartan.SpartanIndex.from_r1cs(r1cs)
    os.makedirs(args.artifacts, exist_ok=True)
    with tracer.span("setup"):
        srs_nv = max(index.nv + 1, 4)
        srs = pst13.setup_cached(srs_nv, seed=args.srs_seed)
        dfs = spartan_dfs.build_index(r1cs, srs) if args.dfs else None
    import pickle

    with open(os.path.join(args.artifacts, "prover.key"), "wb") as f:
        pickle.dump({"builder": b, "srs_nv": srs_nv, "seed": args.srs_seed,
                     "dfs": args.dfs}, f)
    print(f"setup ok: nv={index.nv} srs_nv={srs_nv} "
          f"constraints={r1cs.num_constraints} wires={r1cs.num_wires}")


def _load_artifacts(artifacts):
    import pickle

    from .models import spartan, spartan_dfs
    from .ops import pst13

    with open(os.path.join(artifacts, "prover.key"), "rb") as f:
        keydata = pickle.load(f)
    b = keydata["builder"]
    r1cs = b.build()
    index = spartan.SpartanIndex.from_r1cs(r1cs)
    srs = pst13.setup_cached(keydata["srs_nv"], seed=keydata["seed"])
    dfs = spartan_dfs.build_index(r1cs, srs) if keydata["dfs"] else None
    return b, index, srs, dfs


def cmd_prove(args):
    from .models import co_spartan, spartan

    b, index, srs, dfs = _load_artifacts(args.artifacts)
    inputs = [int(x) for x in args.inputs.split(",")] if args.inputs else []
    z = b.solve_witness(inputs)
    with tracer.span("prove"):
        if args.rep3:
            proof = co_spartan.prove_rep3(index, srs, z)
        else:
            proof = spartan.prove(index, srs, z, dfs=dfs,
                                  ckpt=args.checkpoint_dir or None)
    ser.dump(proof, args.out)
    tracer.report()
    if args.chrome_trace:
        tracer.chrome_trace(args.chrome_trace)
    print(f"proof written to {args.out}")


def cmd_verify(args):
    from .models import spartan

    b, index, srs, dfs = _load_artifacts(args.artifacts)
    proof = ser.load(args.proof)
    inputs = [int(x) for x in args.inputs.split(",")] if args.inputs else []
    ok = spartan.verify(index, srs, inputs, proof,
                        dfs_vk=dfs.vk if dfs else None)
    print("verification:", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


def cmd_stats(args):
    b = _load_builder(args.circuit)
    r1cs = b.build()
    nnz = sum(len(m.rows) for m in (r1cs.a, r1cs.b, r1cs.c))
    print(json.dumps({
        "constraints": r1cs.num_constraints,
        "wires": r1cs.num_wires,
        "public": r1cs.num_public,
        "nnz": nnz,
        "nv": r1cs.nv,
    }))


def main(argv=None):
    p = argparse.ArgumentParser(prog="co_zkvms_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("setup")
    ps.add_argument("--circuit", required=True)
    ps.add_argument("--artifacts", default="artifacts")
    ps.add_argument("--srs-seed", type=int, default=0)
    ps.add_argument("--dfs", action="store_true",
                    help="build the succinct (logup) index")
    ps.set_defaults(fn=cmd_setup)

    pp = sub.add_parser("prove")
    pp.add_argument("--artifacts", default="artifacts")
    pp.add_argument("--inputs", default="")
    pp.add_argument("--rep3", action="store_true")
    pp.add_argument("--out", default="proof.json.gz")
    pp.add_argument("--chrome-trace", default="")
    pp.add_argument("--checkpoint-dir", default="",
                    help="journal proof phases here; a preempted prove "
                         "resumes from the last completed phase")
    pp.set_defaults(fn=cmd_prove)

    pv = sub.add_parser("verify")
    pv.add_argument("--artifacts", default="artifacts")
    pv.add_argument("--proof", default="proof.json.gz")
    pv.add_argument("--inputs", default="")
    pv.set_defaults(fn=cmd_verify)

    pt = sub.add_parser("stats")
    pt.add_argument("--circuit", required=True)
    pt.set_defaults(fn=cmd_stats)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
