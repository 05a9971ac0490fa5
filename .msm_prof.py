import time, jax, jax.numpy as jnp
from co_zkvms_tpu.ops import curve as C, field as F, msm as M, ref_bn254 as bn
from co_zkvms_tpu.ops.field import FR
from co_zkvms_tpu.ops import curve_pallas as CP

def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return int(jax.device_get(leaf.reshape(-1)[0]))

n = 1 << 16
k1, k2 = jax.random.split(jax.random.key(0))
g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
g1 = C.APoint(g.x[0], g.y[0])
exps = F.random(FR, k1, (n,))
pts = C.to_affine(M.fixed_base_msm(g1, exps))
scalars = F.random(FR, k2, (n,))
sync((pts.x, scalars)); print("setup done", flush=True)

c = 10
digits = M.window_digits(scalars, c); sync(digits)
nw = M._n_windows(c)
occs = [int(v) for v in jax.device_get(M._occupancies(digits, c))]
print("occs:", occs, flush=True)
pts32 = jnp.concatenate([pts.x, pts.y], axis=-1)

def timeit(name, fn, reps=3):
    fn(); 
    best = 1e9
    for _ in range(reps):
        t0=time.time(); fn(); best=min(best, time.time()-t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)

r_low = max(max(occs[:nw-1]), 1)
r_low = 8 if r_low<=8 else ((r_low + (1<<(r_low.bit_length()-3)) -1)//(1<<(r_low.bit_length()-3)))*(1<<(r_low.bit_length()-3))
print("r_low:", r_low, flush=True)

timeit("digits", lambda: sync(M.window_digits(scalars, c)))
timeit("occupancies", lambda: sync(M._occupancies(digits, c)))
timeit("dense_grid 1 window", lambda: sync(M._dense_grid(pts32, digits[0], c, r_low)))
timeit("fused_group low (25 win)", lambda: sync(M._fused_group(pts32, digits[:nw-1], c, r_low)))
low = M._fused_group(pts32, digits[:nw-1], c, r_low)
timeit("weighted_sum", lambda: sync(M._weighted_sum_jit(low, c)))
sums = M._weighted_sum_jit(low, c)
timeit("horner", lambda: sync(M._horner_windows(sums, c, nw-1)))
# bucket kernel alone at grid shape
u = min(4, max(1, 4096 // (1<<c)))
r_eff = ((r_low + u - 1)//u)*u
qx, qy, _ = M._dense_grid(pts32, digits[0], c, r_eff)
qx = qx.reshape(r_eff//u, u, 16, 1<<c).transpose(0,2,1,3).reshape(r_eff//u,16,u*(1<<c))
qy = qy.reshape(r_eff//u, u, 16, 1<<c).transpose(0,2,1,3).reshape(r_eff//u,16,u*(1<<c))
sync((qx,qy))
timeit("bucket_accumulate 1 window", lambda: sync(CP.bucket_accumulate(qx, qy, u*(1<<c))))
