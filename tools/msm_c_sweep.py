"""Full-MSM steady-state timing across window sizes on the chip.

Usage: python tools/msm_c_sweep.py [n_log2] [c1 c2 ...]
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(
                      os.path.dirname(__file__), "..", ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from co_zkvms_tpu.ops import curve as C, field as F, msm as M
from co_zkvms_tpu.ops import ref_bn254 as bn
from co_zkvms_tpu.ops.field import FR

n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
cs = [int(a) for a in sys.argv[2:]] or [12, 13, 14]
n = 1 << n_log2
print(f"devices: {jax.devices()} n=2^{n_log2} cs={cs}", flush=True)

g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
g1 = C.APoint(g.x[0], g.y[0])
exps = F.random(FR, jax.random.key(100 + n_log2), (n,))
pts = C.to_affine(M.fixed_base_msm(g1, exps))
sc = F.random(FR, jax.random.key(200 + n_log2), (n,))
want = None

for c in cs:
    t0 = time.time()
    res = M.msm(pts, sc, c=c)
    got = C.points_to_ints(C.to_affine(res))[0]
    warm = time.time() - t0
    if want is None:
        want = got
    ok = got == want
    ts = []
    for _ in range(3):
        t0 = time.time()
        res = M.msm(pts, sc, c=c)
        int(jax.device_get(res.x.ravel()[0]))
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"c={c}: warm {warm:.1f}s steady {best*1e3:.0f} ms -> "
          f"{n/best:,.0f} pts/s  consistent={ok}", flush=True)
