import time, sys, jax, jax.numpy as jnp
from co_zkvms_tpu.ops import curve as C, field as F, msm as M, ref_bn254 as bn
from co_zkvms_tpu.ops.field import FR
def sync(p): return int(jax.device_get(p.x[0,0]))
n_log2 = int(sys.argv[1]) if len(sys.argv)>1 else 16
n = 1 << n_log2
k1, k2 = jax.random.split(jax.random.key(0))
g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
g1 = C.APoint(g.x[0], g.y[0])
exps = F.random(FR, k1, (n,))
pts = C.to_affine(M.fixed_base_msm(g1, exps))
scalars = F.random(FR, k2, (n,))
int(jax.device_get(pts.x[0,0])); print("setup done", flush=True)
# correctness vs while-loop path at 2^12
ns = 1 << 12
rf = M.msm(C.APoint(pts.x[:ns], pts.y[:ns]), scalars[:ns], c=10)
rr = M._horner_host(M._all_window_sums(C.APoint(pts.x[:ns], pts.y[:ns]), M.window_digits(scalars[:ns], 8), 8), 8)
import numpy as np
af, ar = C.to_affine(rf), C.to_affine(rr)
print("CORRECT:", np.array_equal(jax.device_get(af.x), jax.device_get(ar.x)), flush=True)
for c in ([10, 12] if n_log2<=16 else [12]):
    t0=time.time(); r = M.msm(pts, scalars, c=c); sync(r)
    print(f"c={c} warmup: {time.time()-t0:.1f}s", flush=True)
    best=1e9
    for _ in range(3):
        t0=time.time(); r = M.msm(pts, scalars, c=c); sync(r)
        best=min(best, time.time()-t0)
    print(f"c={c} n=2^{n_log2}: {best:.3f}s -> {n/best:,.0f} pts/s", flush=True)
