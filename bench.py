"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: variable-base MSM throughput (points/s/chip) — the kernel the
reference pipeline is bound by (BASELINE.md: party-side PST13 ``batch_msm``
= 144.5 s of a 344 s co-Jolt proof).

vs_baseline: the reference gives no direct MSM ops/s number; we derive an
estimate from its committed trace: sha2-chain x300 => trace length ~2^20,
Jolt commits O(100) polynomials of that length per party, so ~1e8 points in
144.5 s ~= 7e5 points/s on the 32-CPU host. vs_baseline = ours / 7e5.

Secondary numbers (stderr): field-mul throughput, sumcheck round throughput,
e2e Spartan prove latency on a 2^12-constraint circuit.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

REF_MSM_POINTS_PER_S = 7.0e5  # documented estimate, see module docstring


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_msm(n_log2=16, c=8, iters=3):
    from co_zkvms_tpu.ops import curve as C
    from co_zkvms_tpu.ops import field as F
    from co_zkvms_tpu.ops import msm as M
    from co_zkvms_tpu.ops.field import FR, FQ

    n = 1 << n_log2
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    # pseudo-points: random multiples of G via fixed-base (device-side)
    from co_zkvms_tpu.ops import ref_bn254 as bn

    g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
    g1 = C.APoint(g.x[0], g.y[0])
    exps = F.random(FR, k1, (n,))
    pts = C.to_affine(M.fixed_base_msm(g1, exps))
    scalars = F.random(FR, k2, (n,))
    jax.block_until_ready((pts, scalars))
    log(f"msm setup done: n=2^{n_log2}")

    # NB: block_until_ready does not synchronize through this environment's
    # TPU relay — a host fetch of one limb forces real completion.
    def sync(p):
        return int(jax.device_get(p.x[0, 0]))

    t0 = time.time()
    res = M.msm(pts, scalars, c=c)
    sync(res)
    log(f"msm warmup (compile+run): {time.time()-t0:.2f}s")

    times = []
    for _ in range(iters):
        t0 = time.time()
        res = M.msm(pts, scalars, c=c)
        sync(res)
        times.append(time.time() - t0)
    best = min(times)
    log(f"msm n=2^{n_log2} c={c}: best {best:.3f}s -> {n/best:,.0f} points/s")
    return n / best


def bench_field_mul(n_log2=20, chain=50):
    from co_zkvms_tpu.ops import field as F
    from co_zkvms_tpu.ops.field import FR

    n = 1 << n_log2
    a = F.random(FR, jax.random.key(1), (n,))
    b = F.random(FR, jax.random.key(2), (n,))
    out = F.mul(FR, a, b)
    int(jax.device_get(out[0, 0]))  # real sync (block_until_ready lies here)
    # dependent chain with a single sync: measures steady-state per-mul time
    t0 = time.time()
    for _ in range(chain):
        out = F.mul(FR, out, b)
    int(jax.device_get(out[0, 0]))
    per = (time.time() - t0) / chain
    log(f"field mul n=2^{n_log2}: {per*1e3:.3f}ms/mul -> {n/per/1e6:.1f} Mmul/s")
    return n / per


def bench_spartan_e2e(n_cons_log2=10):
    from co_zkvms_tpu.models import spartan
    from co_zkvms_tpu.models.synthetic import squaring_chain
    from co_zkvms_tpu.ops import pst13

    b = squaring_chain((1 << n_cons_log2) - 4)
    z = b.solve_witness([3])
    index = spartan.SpartanIndex.from_r1cs(b.build())
    srs = pst13.setup_cached(index.nv, seed=7)
    t0 = time.time()
    proof = spartan.prove(index, srs, z)
    t_first = time.time() - t0
    t0 = time.time()
    proof = spartan.prove(index, srs, z)
    t_second = time.time() - t0
    log(
        f"spartan e2e 2^{n_cons_log2} constraints: first {t_first:.2f}s "
        f"(incl. compile), steady {t_second:.2f}s"
    )
    ok = spartan.verify(index, srs, [3], proof)
    log(f"spartan verify: {ok}")
    return t_second


def main():
    import os

    log(f"devices: {jax.devices()}")
    mul_rate = None
    try:
        mul_rate = bench_field_mul()
    except Exception as e:  # noqa: BLE001
        log(f"field bench failed: {e}")
    if os.environ.get("BENCH_E2E"):
        # e2e Spartan compiles many per-round kernel shapes; opt-in until the
        # fixed-shape scan prover lands (it is covered by CPU tests either way)
        try:
            bench_spartan_e2e()
        except Exception as e:  # noqa: BLE001
            log(f"spartan bench failed: {e}")

    # the TPU relay worker occasionally crashes under sustained load —
    # retry, and always emit a JSON line even if MSM never completes
    pps = None
    for attempt in range(3):
        try:
            pps = bench_msm()
            break
        except Exception as e:  # noqa: BLE001
            log(f"msm bench attempt {attempt} failed: {e}")
            time.sleep(45)
    if pps is not None:
        print(
            json.dumps(
                {
                    "metric": "msm_points_per_s_per_chip",
                    "value": round(pps),
                    "unit": "points/s",
                    "vs_baseline": round(pps / REF_MSM_POINTS_PER_S, 3),
                }
            )
        )
    else:
        # fallback: field-mul throughput vs the reference's ~50 Mmul/s on a
        # 32-core CPU host (arkworks ~1.5M mul/s/core)
        print(
            json.dumps(
                {
                    "metric": "field_mul_per_s_per_chip",
                    "value": round(mul_rate or 0),
                    "unit": "mulmod/s",
                    "vs_baseline": round((mul_rate or 0) / 5.0e7, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
