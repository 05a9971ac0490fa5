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


def cmd_pod_setup(args):
    """Write per-(party, chunk) artifacts for a multi-host pod run (maps
    ``co-spartan setup`` writing worker_{i}.key slices, cli/setup.rs:41-89,
    plus the witness-share distribution of witness.rs:21-58 — seeded, so it
    costs 1/3 of naive bytes)."""
    import jax

    from .models import spartan
    from .ops import pst13
    from .utils import artifacts as ART

    b = _load_builder(args.circuit)
    r1cs = b.build()
    index = spartan.SpartanIndex.from_r1cs(r1cs)
    inputs = [int(x) for x in args.inputs.split(",")] if args.inputs else []
    z = b.solve_witness(inputs)
    os.makedirs(args.artifacts, exist_ok=True)
    with tracer.span("pod-setup"):
        srs_nv = max(index.nv + 1, 4)
        pst13.setup_cached(srs_nv, seed=args.srs_seed)
        ART.write_spartan_setup(args.artifacts, index, args.chunks)
        ART.write_witness_shares(args.artifacts, index, z,
                                 jax.random.key(args.share_seed), args.chunks)
    import pickle

    with open(os.path.join(args.artifacts, "pod.json"), "w") as f:
        json.dump({"srs_nv": srs_nv, "srs_seed": args.srs_seed,
                   "chunks": args.chunks, "inputs": inputs}, f)
    with open(os.path.join(args.artifacts, "builder.pkl"), "wb") as f:
        pickle.dump(b, f)
    print(f"pod-setup ok: nv={index.nv} chunks={args.chunks} -> "
          f"{args.artifacts}")


def cmd_pod_prove(args):
    """One-command multi-host prove: every host runs THIS command with its
    --process-id; artifacts stream in per-host (addressable shards only),
    the proof is identical on every host and verified in-process on host 0.

    Rehearsal without a pod: launch 3 local processes with
    --coordinator 127.0.0.1:<port> --num-processes 3 --process-id {0,1,2}
    (cross-process collectives via gloo on CPU — same code as a TPU pod)."""
    import time as _time

    import jax

    from .models import co_spartan, spartan
    from .ops import pst13
    from .parallel import comm, multihost as MH
    from .utils import artifacts as ART

    with open(os.path.join(args.artifacts, "pod.json")) as f:
        pod = json.load(f)
    if args.num_processes and args.num_processes > 1:
        MH.init(args.coordinator, args.num_processes, args.process_id)
    pid, nproc = MH.process_role()
    mesh = MH.party_chunk_mesh(args.chunk or None)
    srs = pst13.setup_cached(pod["srs_nv"], seed=pod["srs_seed"])
    comm.enable(True)

    t0 = _time.time()
    index = ART.load_spartan_setup(args.artifacts, mesh)
    wit = ART.load_witness_shares(args.artifacts, mesh)
    t_load = _time.time() - t0
    t0 = _time.time()
    with tracer.span("pod-prove"):
        proof = co_spartan.prove_rep3(index, srs, None, witness=wit,
                                      mesh=mesh,
                                      ckpt=args.checkpoint_dir or None)
    t_prove = _time.time() - t0
    print(f"[host {pid}/{nproc}] load {t_load:.2f}s prove {t_prove:.2f}s "
          f"comm={json.dumps(comm.counters())}")
    if pid == 0:
        import pickle

        ser.dump(proof, args.out)
        with open(os.path.join(args.artifacts, "builder.pkl"), "rb") as f:
            b = pickle.load(f)
        index_v = spartan.SpartanIndex.from_r1cs(b.build())
        ok = spartan.verify(index_v, srs, pod["inputs"], proof)
        print(f"[host 0] proof -> {args.out}; in-process verify: "
              f"{'OK' if ok else 'FAILED'}")
        if not ok:
            sys.exit(1)


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

    pps = sub.add_parser("pod-setup")
    pps.add_argument("--circuit", required=True)
    pps.add_argument("--artifacts", default="pod_artifacts")
    pps.add_argument("--chunks", type=int, default=2)
    pps.add_argument("--inputs", default="")
    pps.add_argument("--srs-seed", type=int, default=0)
    pps.add_argument("--share-seed", type=int, default=11)
    pps.set_defaults(fn=cmd_pod_setup)

    ppp = sub.add_parser("pod-prove")
    ppp.add_argument("--artifacts", default="pod_artifacts")
    ppp.add_argument("--coordinator", default=None,
                     help="host:port of process 0 (jax.distributed)")
    ppp.add_argument("--num-processes", type=int, default=0)
    ppp.add_argument("--process-id", type=int, default=0)
    ppp.add_argument("--chunk", type=int, default=0,
                     help="chunk-axis size (default: devices/3)")
    ppp.add_argument("--out", default="proof.json.gz")
    ppp.add_argument("--checkpoint-dir", default="")
    ppp.set_defaults(fn=cmd_pod_prove)

    args = p.parse_args(argv)
    if os.environ.get("COZK_PLATFORM"):
        # JAX_PLATFORMS is latched at interpreter start in some
        # environments (TPU plugin via sitecustomize); this env var forces
        # the backend through the config instead — used by the CPU
        # pod-rehearsal (tests/test_multihost.py) and local debugging
        import jax

        jax.config.update("jax_platforms", os.environ["COZK_PLATFORM"])
    if os.environ.get("COZK_CACHE"):
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ["COZK_CACHE"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    args.fn(args)


if __name__ == "__main__":
    main()
