"""Field-mul throughput decomposition probe (run on the real TPU).

Separates the three candidate costs behind the 13.7%-of-roofline r3 number:
(a) the kernel-boundary layout transposes ([N,16] <-> [16,N]) paid by every
    standalone F.mul call,
(b) the Pallas kernel's own compute rate (limb-major resident chain),
(c) XLA's ability to cancel the transposes between dependent muls inside one
    jitted program (the realistic sumcheck/Poseidon/NTT shape).

Usage: python tools/field_probe.py [n_log2] [chain]
Env:   MSM_CACHE_DIR=<dir> persistent compile cache.
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

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import field_pallas as FP
from co_zkvms_tpu.ops.field import FR

HBM_GBPS = 819.0


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return int(jax.device_get(jnp.ravel(leaf)[0]))


def rate(name, fn, n, muls, reps=3):
    sync(fn())
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        best = min(best, time.time() - t0)
    r = n * muls / best
    ideal = HBM_GBPS * 1e9 / (3 * 64)
    print(f"{name}: {best*1e3:.1f}ms -> {r/1e6:.1f} Mmul/s "
          f"({100*r/ideal:.1f}% of HBM roofline)", flush=True)
    return r


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    n = 1 << n_log2
    print(f"devices: {jax.devices()} n=2^{n_log2} chain={chain}", flush=True)
    a = F.random(FR, jax.random.key(1), (n,))
    b = F.random(FR, jax.random.key(2), (n,))
    sync((a, b))

    # (a) standalone call, transposes every time
    rate("single-call mul", lambda: F.mul(FR, a, b), n, 1)

    # (c) dependent chain under ONE jit: interior transposes cancel
    @jax.jit
    def chain_fn(x, y):
        for _ in range(chain):
            x = F.mul(FR, x, y)
        return x

    rate(f"jit chain x{chain}", lambda: chain_fn(a, b), n, chain)

    # (b) limb-major resident: no transposes at all
    a_t = a.T.copy()
    b_t = b.T.copy()
    sync((a_t, b_t))

    @jax.jit
    def chain_lm(x_t, y_t):
        for _ in range(chain):
            x_t = FP.mul_limb_major(FR, x_t, y_t)
        return x_t

    rate(f"limb-major chain x{chain}", lambda: chain_lm(a_t, b_t), n, chain)

    # square kernel
    @jax.jit
    def chain_sq(x_t):
        for _ in range(chain):
            x_t = FP.square_limb_major(FR, x_t)
        return x_t

    rate(f"limb-major square x{chain}", lambda: chain_sq(a_t), n, chain)

    # independent (non-dependent) muls: latency-hiding upper bound
    @jax.jit
    def indep(x_t, y_t):
        outs = [FP.mul_limb_major(FR, jnp.roll(x_t, i, axis=1), y_t)
                for i in range(4)]
        return sum(o.astype(jnp.uint64).sum() for o in outs)

    sync(indep(a_t, b_t))
    t0 = time.time()
    sync(indep(a_t, b_t))
    dt = time.time() - t0
    ideal = HBM_GBPS * 1e9 / (3 * 64)
    r = 4 * n / dt
    print(f"independent x4: {dt*1e3:.1f}ms -> {r/1e6:.1f} Mmul/s "
          f"({100*r/ideal:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
