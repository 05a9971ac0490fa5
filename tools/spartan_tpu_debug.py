"""Bisect the TPU-only spartan verify failure (round 4).

Runs a small Spartan e2e on the TPU under toggles:
  baseline               — current code
  COZK_SC_CHUNK=4096     — restore the old sumcheck chunk (set via env)
  --no-fused             — force the non-fused MSM path
  --no-byvalue           — disable the by-value counter MSM path

Usage: python tools/spartan_tpu_debug.py [n_log2] [--no-fused] [--no-byvalue]
"""

import os
import sys
import time

if os.environ.get("MSM_CACHE_DIR"):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(os.environ["MSM_CACHE_DIR"]))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax

from co_zkvms_tpu.models import spartan
from co_zkvms_tpu.models.synthetic import squaring_chain
from co_zkvms_tpu.ops import msm as M
from co_zkvms_tpu.ops import pst13


def main():
    args = sys.argv[1:]
    n_log2 = int(args[0]) if args and not args[0].startswith("--") else 8
    if "--no-fused" in args:
        M.msm.__globals__["__no_fused"] = True
        orig = M.msm

        def msm_nofused(points, scalars_mont, c=None):
            import jax.numpy as jnp

            n = points.x.shape[0]
            cc = c if c is not None else M._auto_c(n)
            digits = M.window_digits(scalars_mont, cc)
            sums = M._all_window_sums(points, digits, cc)
            return M._horner_host(sums, cc)

        M.msm = msm_nofused
        pst13.M.msm = msm_nofused
        print("fused msm DISABLED", flush=True)
    if "--no-byvalue" in args:
        M._small_value_stats_orig = M._small_value_stats

        def never_small(std):
            import jax.numpy as jnp

            return jnp.asarray(False), jnp.asarray(1 << 30)

        M._small_value_stats = never_small
        print("by-value msm DISABLED", flush=True)

    print(f"devices: {jax.devices()} n=2^{n_log2} "
          f"chunk={os.environ.get('COZK_SC_CHUNK', 'default')}", flush=True)
    b = squaring_chain((1 << n_log2) - 4)
    z = b.solve_witness([3])
    index = spartan.SpartanIndex.from_r1cs(b.build())
    srs = pst13.setup_cached(index.nv, seed=7)
    t0 = time.time()
    proof = spartan.prove(index, srs, z)
    print(f"prove: {time.time()-t0:.1f}s", flush=True)
    ok = spartan.verify(index, srs, [3], proof)
    print(f"VERIFY: {ok}", flush=True)


if __name__ == "__main__":
    main()
