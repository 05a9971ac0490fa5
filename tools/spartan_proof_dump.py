"""Dump a spartan proof (pickle) for cross-backend diffing.

Usage: python tools/spartan_proof_dump.py <out.pkl> [n_log2] [--cpu]
"""

import os
import pickle
import sys
import time

out = sys.argv[1]
n_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 12
force_cpu = "--cpu" in sys.argv

import jax

if force_cpu:
    jax.config.update("jax_platforms", "cpu")
if os.environ.get("MSM_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(os.environ["MSM_CACHE_DIR"]))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from co_zkvms_tpu.models import spartan
from co_zkvms_tpu.models.synthetic import squaring_chain
from co_zkvms_tpu.ops import pst13

print(f"backend: {jax.default_backend()} n=2^{n_log2}", flush=True)
b = squaring_chain((1 << n_log2) - 4)
z = b.solve_witness([3])
index = spartan.SpartanIndex.from_r1cs(b.build())
srs = pst13.setup_cached(index.nv, seed=7)
t0 = time.time()
proof = spartan.prove(index, srs, z)
print(f"prove: {time.time()-t0:.1f}s", flush=True)
with open(out, "wb") as fh:
    pickle.dump(proof, fh)
print(f"verify: {spartan.verify(index, srs, [3], proof)}", flush=True)
print(f"wrote {out}", flush=True)
