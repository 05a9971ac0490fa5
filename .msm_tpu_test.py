import time, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from co_zkvms_tpu.ops import curve as C, field as F, msm as M, ref_bn254 as bn
from co_zkvms_tpu.ops.field import FR

def sync(p): return int(jax.device_get(p.x[0,0]))

n_log2 = 16
n = 1 << n_log2
k1, k2 = jax.random.split(jax.random.key(0))
g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
g1 = C.APoint(g.x[0], g.y[0])
exps = F.random(FR, k1, (n,))
pts = C.to_affine(M.fixed_base_msm(g1, exps))
scalars = F.random(FR, k2, (n,))
sync_pt = int(jax.device_get(pts.x[0,0])); print("setup done", flush=True)

# correctness: fused vs ground truth on a small slice
ns = 1 << 12
small_pts = C.APoint(pts.x[:ns], pts.y[:ns])
small_sc = scalars[:ns]
t0=time.time()
r_fused = M.msm(small_pts, small_sc, c=10)   # fused path (tpu, n>=2^(c+2))
sync(r_fused); print(f"fused small msm: {time.time()-t0:.1f}s", flush=True)
aff_f = C.to_affine(r_fused)
xf = F.to_int(FR, jax.device_get(aff_f.x))[0] if hasattr(F,'to_int') else None
t0=time.time()
r_ref = M._horner_windows(M._all_window_sums(small_pts, M.window_digits(small_sc, 8), 8), 8, M._n_windows(8))
sync(r_ref); print(f"while-loop small msm: {time.time()-t0:.1f}s", flush=True)
aff_r = C.to_affine(r_ref)
import numpy as np
ok = np.array_equal(jax.device_get(aff_f.x), jax.device_get(aff_r.x)) and np.array_equal(jax.device_get(aff_f.y), jax.device_get(aff_r.y))
print("CORRECTNESS fused==whileloop:", ok, flush=True)

for c in (10, 12):
    t0=time.time()
    r = M.msm(pts, scalars, c=c); sync(r)
    print(f"c={c} warmup: {time.time()-t0:.1f}s", flush=True)
    best=1e9
    for _ in range(3):
        t0=time.time(); r = M.msm(pts, scalars, c=c); sync(r)
        best=min(best, time.time()-t0)
    print(f"c={c} n=2^{n_log2}: {best:.3f}s -> {n/best:,.0f} pts/s", flush=True)
