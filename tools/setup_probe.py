"""Bisect the MSM-bench *setup* path (fixed-base MSM + to_affine) at scale.

Round-3's '2^20 MSM crash' is actually a crash in test-point generation:
fixed_base_msm/to_affine at n >= 2^18 kills the TPU worker before the
Pippenger kernel ever runs. This probe runs each setup stage separately.

Usage: python tools/setup_probe.py [n_log2]
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
import jax.numpy as jnp

from co_zkvms_tpu.ops import curve as C, field as F, msm as M, ref_bn254 as bn
from co_zkvms_tpu.ops.field import FR


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return int(jax.device_get(jnp.ravel(leaf)[0]))


def stage(name, fn):
    t0 = time.time()
    out = fn()
    sync(out)
    print(f"{name}: {time.time()-t0:.2f}s", flush=True)
    return out


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << n_log2
    print(f"devices: {jax.devices()} n=2^{n_log2}", flush=True)
    k1, k2 = jax.random.split(jax.random.key(0))
    g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
    g1 = C.APoint(g.x[0], g.y[0])
    exps = stage("random exps", lambda: F.random(FR, k1, (n,)))
    stage("random scalars", lambda: F.random(FR, k2, (n,)))
    table = stage("fixed_base_table", lambda: M._fixed_base_table(g1, 8))
    digits = stage("window_digits", lambda: M.window_digits(exps, 8))
    jac = stage("fixed_base_apply",
                lambda: M._fixed_base_apply(table, digits, 8))
    aff = stage("to_affine", lambda: C.to_affine(jac))
    print("SETUP_PROBE_OK", flush=True)


if __name__ == "__main__":
    main()
