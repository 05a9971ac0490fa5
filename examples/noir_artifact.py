"""Prove a nargo-compiled Noir circuit (ProgramArtifact JSON).

Mirrors the reference's noir-r1cs CLI (`noir-r1cs prove <artifact>
<Prover.toml>`): decode the ACIR bincode bytecode, compile AssertZero
opcodes to R1CS (noir_to_r1cs.rs behavior), solve the witness from ABI
inputs, and emit + verify a Spartan proof.

Run: python examples/noir_artifact.py <artifact.json> [Prover.toml]

With no arguments it looks for the reference's committed passport
examples; if absent, it synthesizes a small artifact so the example is
always runnable.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import glob

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from co_zkvms_tpu.models import noir, spartan
from co_zkvms_tpu.ops import pst13

REF_ARTIFACTS = ("/root/reference/co-noir-spartan/noir-r1cs/noir-examples/"
                 "noir-passport-examples/*.json")


def main():
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        found = sorted(glob.glob(REF_ARTIFACTS))
        path = found[0] if found else None

    if path is None:
        print("no artifact given/found — synthesizing a demo circuit")
        import tests.test_noir_artifact as tna

        class _Tmp:  # minimal tmp_path shim
            def __truediv__(self, name):
                import pathlib
                import tempfile

                d = pathlib.Path(tempfile.mkdtemp())
                return d / name

        path = tna._make_artifact(_Tmp())
        inputs = {"a": 4, "b": 2, "c": 2}
    else:
        inputs = None

    art = noir.load_noir_artifact(path)
    r1cs = art.build()
    print(f"{os.path.basename(path)}: {r1cs.num_constraints} constraints, "
          f"{r1cs.num_wires} wires, nv={r1cs.nv}")

    if inputs is None and len(sys.argv) > 2:
        inputs = noir.load_prover_toml(sys.argv[2])
    if inputs is None:
        print("no Prover.toml — artifact decoded + compiled only "
              "(witness inputs needed to prove)")
        return

    z = art.solve_witness(inputs)
    index = spartan.SpartanIndex.from_r1cs(r1cs)
    srs = pst13.setup_cached(max(index.nv + 1, 4), seed=7)
    t0 = time.time()
    proof = spartan.prove(index, srs, z)
    print(f"proved in {time.time() - t0:.1f}s")
    pub = z[1:r1cs.num_public]
    ok = spartan.verify(index, srs, pub, proof)
    print(f"verified={ok}")
    assert ok


if __name__ == "__main__":
    main()
