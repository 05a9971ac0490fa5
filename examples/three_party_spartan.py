"""3-party MPC Spartan example over an explicit party mesh.

Mirrors the reference's `co-jolt/examples/run_3_party_jolt.sh` +
`config_party{1,2,3}.toml` flow (coordinator + three workers over QUIC),
re-designed TPU-first: the three Rep3 parties are a **mesh axis** — the
share stack is `[3, N, 16]` laid out `PartitionSpec("party", "chunk")`,
and every protocol round is one GSPMD-sharded program in which XLA's
collectives (ppermute for reshares, psum for openings) replace the
reference's point-to-point QUIC messages.

The MPC proof is bit-identical to the single-party one — the strongest
conformance check the package offers (and the property the reference's
own tests assert via proof verification).

Run: python examples/three_party_spartan.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    # 6 virtual devices -> party(3) x chunk(2) mesh on one host
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=6"

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np
from jax.sharding import Mesh

from co_zkvms_tpu.models import co_spartan, spartan
from co_zkvms_tpu.models.r1cs import R1CSBuilder
from co_zkvms_tpu.ops import pst13


def demo_circuit(n_blocks: int = 16):
    """A chain of x_{i+1} = x_i^2 + x_i + i blocks (one public input/output)."""
    b = R1CSBuilder(num_public=2)  # [1, x0]
    cur = 1
    for i in range(n_blocks):
        sq = b.new_wire()
        nxt = b.new_wire()
        b.add_constraint([(1, cur)], [(1, cur)], [(1, sq)])
        b.add_constraint([(1, sq), (1, cur), (i, 0)], [(1, 0)], [(1, nxt)])
        cur = nxt
    return b


def main():
    b = demo_circuit()
    r1cs = b.build()
    z = b.solve_witness([3])
    index = spartan.SpartanIndex.from_r1cs(r1cs)
    srs = pst13.setup_cached(max(index.nv + 1, 4), seed=9)
    pub = z[1:r1cs.num_public]

    devices = np.array(jax.devices()[:6]).reshape(3, 2)
    mesh = Mesh(devices, ("party", "chunk"))
    print(f"mesh: {dict(mesh.shape)} over {devices.size} devices")

    t0 = time.time()
    mpc_proof = co_spartan.prove_rep3(index, srs, z, mesh=mesh)
    print(f"3-party proof in {time.time() - t0:.1f}s")
    assert spartan.verify(index, srs, pub, mpc_proof)
    print("MPC proof verified")

    single = spartan.prove(index, srs, z)
    assert single == mpc_proof
    print("MPC proof is bit-identical to the single-party proof")


if __name__ == "__main__":
    main()
