"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: variable-base MSM throughput (points/s/chip) at the TUNED
configuration (n=2^20, auto window size -> c=12 fused VMEM kernel on TPU) —
the kernel the reference pipeline is bound by (BASELINE.md: party-side
PST13 ``batch_msm`` = 144.5 s of a 344 s co-Jolt proof).

vs_baseline: the reference gives no direct MSM ops/s number; we derive an
estimate from its committed trace: sha2-chain x300 => trace length ~2^20,
Jolt commits O(100) polynomials of that length per party, so ~1e8 points in
144.5 s ~= 7e5 points/s on the 32-CPU host. vs_baseline = ours / 7e5.

Secondary lines (stderr + BENCH_DETAIL.json, the BASELINE.json set):
- field-mul throughput + roofline % (HBM-bandwidth model: a dependent
  Montgomery mul streams 3 x 64 B per element at ~820 GB/s on v5e);
- MSM roofline % (point-adds/s vs the flat field-mul rate: one mixed add
  = 11 muls + overhead);
- sumcheck round throughput (elements/s, degree-3 4-table comb at 2^20);
- e2e proof latencies: Spartan 2^12 (+2^20 opt-in via BENCH_E2E_BIG),
  linked Jolt zkVM guest;
- multichip scaling: measured separately by the driver via
  __graft_entry__.dryrun_multichip (virtual mesh; ICI numbers need a pod).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

REF_MSM_POINTS_PER_S = 7.0e5  # documented estimate, see module docstring
HBM_GBPS = 819.0              # v5e HBM bandwidth (spec)
DETAIL = {}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _sync_limb(x):
    """Force completion through the TPU relay (block_until_ready lies)."""
    return int(jax.device_get(jnp.ravel(x)[0]))


def bench_msm(n_log2=20, c=None, iters=3):
    from co_zkvms_tpu.ops import curve as C
    from co_zkvms_tpu.ops import field as F
    from co_zkvms_tpu.ops import msm as M
    from co_zkvms_tpu.ops import ref_bn254 as bn
    from co_zkvms_tpu.ops.field import FR

    n = 1 << n_log2
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
    g1 = C.APoint(g.x[0], g.y[0])
    exps = F.random(FR, k1, (n,))
    pts = C.to_affine(M.fixed_base_msm(g1, exps))
    scalars = F.random(FR, k2, (n,))
    jax.block_until_ready((pts, scalars))
    c_eff = c if c is not None else M._auto_c(n)
    log(f"msm setup done: n=2^{n_log2} c={c_eff}")

    t0 = time.time()
    res = M.msm(pts, scalars, c=c)
    _sync_limb(res.x)
    warm = time.time() - t0
    log(f"msm warmup (compile+run): {warm:.2f}s")

    times = []
    for _ in range(iters):
        t0 = time.time()
        res = M.msm(pts, scalars, c=c)
        _sync_limb(res.x)
        times.append(time.time() - t0)
    best = min(times)
    pps = n / best
    # roofline: nw windows x n mixed adds, 11 muls + ~6 adds each ~= 12
    # mul-equivalents, vs the measured flat field-mul rate
    nw = M._n_windows(c_eff)
    mul_rate = DETAIL.get("field_mul_per_s")
    if mul_rate:
        roofline_pps = mul_rate / (nw * 12.0)
        pct = 100.0 * pps / roofline_pps
        DETAIL["msm_roofline_pct"] = round(pct, 1)
        log(f"msm roofline: {pct:.1f}% of field-mul-rate bound "
            f"({roofline_pps:,.0f} pts/s ideal at {nw} windows)")
    log(f"msm n=2^{n_log2} c={c_eff}: best {best:.3f}s -> {pps:,.0f} points/s")
    DETAIL["msm_points_per_s"] = round(pps)
    DETAIL["msm_config"] = {"n_log2": n_log2, "c": c_eff}
    DETAIL["msm_warmup_s"] = round(warm, 1)
    return pps


def bench_field_mul(n_log2=20, chain=50):
    from co_zkvms_tpu.ops import field as F
    from co_zkvms_tpu.ops.field import FR

    n = 1 << n_log2
    a = F.random(FR, jax.random.key(1), (n,))
    b = F.random(FR, jax.random.key(2), (n,))
    out = F.mul(FR, a, b)
    _sync_limb(out)
    t0 = time.time()
    for _ in range(chain):
        out = F.mul(FR, out, b)
    _sync_limb(out)
    per = (time.time() - t0) / chain
    rate = n / per
    # HBM model: read 2 operands + write 1 result, 64 B each per element
    ideal = HBM_GBPS * 1e9 / (3 * 64)
    pct = 100.0 * rate / ideal
    log(f"field mul n=2^{n_log2}: {per*1e3:.3f}ms/mul -> {rate/1e6:.1f} "
        f"Mmul/s ({pct:.1f}% of HBM roofline {ideal/1e6:.0f} Mmul/s)")
    DETAIL["field_mul_per_s"] = round(rate)
    DETAIL["field_mul_roofline_pct"] = round(pct, 1)
    return rate


def bench_sumcheck_round(n_log2=20):
    """Degree-3 4-table comb (the GKR/outer-Spartan inner loop): full prove
    over 2^n elements; reports elements/s across all rounds and the
    bandwidth roofline of the dominant first round."""
    from co_zkvms_tpu.ops import field as F
    from co_zkvms_tpu.ops import sumcheck as SC
    from co_zkvms_tpu.ops import transcript as T
    from co_zkvms_tpu.ops.field import FR

    n = 1 << n_log2
    polys = [F.random(FR, jax.random.key(10 + i), (n,)) for i in range(4)]
    state = T.HostTranscript(b"bench").device_state()

    def comb(ps):
        eq, az, bz, cz = ps
        return F.mul(FR, eq, F.sub(FR, F.mul(FR, az, bz), cz))

    from co_zkvms_tpu.ops import poly as P

    taus = F.random(FR, jax.random.key(14), (n_log2,))
    eq_t = P.eq_table(FR, taus)

    def run(use_split):
        if use_split:
            return SC.prove(FR, state, polys[1:], degree=3, comb=comb,
                            eq_split=taus)
        return SC.prove(FR, state, [eq_t] + polys[1:], degree=3, comb=comb)

    times = {}
    for mode in (False, True):
        res = run(mode)
        _sync_limb(res.round_msgs)
        t0 = time.time()
        res = run(mode)
        _sync_limb(res.round_msgs)
        times[mode] = time.time() - t0
    dt = times[True]
    rate = n / dt
    # split-eq streams 3 tables + half-size suffix and binds 3; rounds
    # halve, so total traffic ~= 2x first round
    traffic = 2 * (3.5 + 1.5) * 64 * n
    ideal = n / (traffic / (HBM_GBPS * 1e9))
    pct = 100.0 * rate / ideal
    log(f"sumcheck d3 full prove 2^{n_log2}: split-eq {dt:.3f}s vs "
        f"eq-in-comb {times[False]:.3f}s "
        f"({times[False]/dt:.2f}x) -> {rate/1e6:.1f} M elements/s "
        f"({pct:.1f}% of HBM roofline)")
    DETAIL["sumcheck_elems_per_s"] = round(rate)
    DETAIL["sumcheck_roofline_pct"] = round(pct, 1)
    DETAIL["sumcheck_split_eq_speedup"] = round(times[False] / dt, 2)
    return rate


def bench_ntt(n_log2=20):
    """Radix-2 NTT over Fr: full transform throughput + mul-rate roofline
    (log2(N) stages x N/2 butterflies, 1 modmul each)."""
    from co_zkvms_tpu.ops import field as F
    from co_zkvms_tpu.ops import ntt as N
    from co_zkvms_tpu.ops.field import FR

    n = 1 << n_log2
    x = F.random(FR, jax.random.key(20), (n,))
    out = N.ntt(FR, x)
    _sync_limb(out)
    t0 = time.time()
    out = N.ntt(FR, x)
    _sync_limb(out)
    dt = time.time() - t0
    rate = n / dt
    mul_rate = DETAIL.get("field_mul_per_s")
    if mul_rate:
        ideal = mul_rate / (n_log2 / 2)  # N/2 muls per stage, log2(N) stages
        pct = 100.0 * rate / ideal
        DETAIL["ntt_roofline_pct"] = round(pct, 1)
        log(f"ntt 2^{n_log2}: {dt*1e3:.1f}ms -> {rate/1e6:.2f} M elems/s "
            f"({pct:.1f}% of field-mul-rate bound)")
    DETAIL["ntt_elems_per_s"] = round(rate)
    return rate


def bench_poseidon(n_log2=18):
    """Batched Poseidon t=3 (2-to-1): hashes/s + mul-rate roofline
    (828 modmuls per permutation: 8 full rounds x 18 + 57 partial x 12)."""
    from co_zkvms_tpu.ops import field as F
    from co_zkvms_tpu.ops import poseidon as P
    from co_zkvms_tpu.ops.field import FR

    n = 1 << n_log2
    a = F.random(FR, jax.random.key(21), (n,))
    b = F.random(FR, jax.random.key(22), (n,))
    out = P.hash2(a, b)
    _sync_limb(out)
    t0 = time.time()
    out = P.hash2(a, b)
    _sync_limb(out)
    dt = time.time() - t0
    rate = n / dt
    mul_rate = DETAIL.get("field_mul_per_s")
    if mul_rate:
        ideal = mul_rate / 828.0
        pct = 100.0 * rate / ideal
        DETAIL["poseidon_roofline_pct"] = round(pct, 1)
        log(f"poseidon 2^{n_log2} hashes: {dt*1e3:.1f}ms -> "
            f"{rate/1e6:.2f} M hash/s ({pct:.1f}% of field-mul-rate bound)")
    DETAIL["poseidon_hashes_per_s"] = round(rate)
    return rate


def bench_spartan_e2e(n_cons_log2=12):
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
    log(f"spartan e2e 2^{n_cons_log2} constraints: first {t_first:.2f}s "
        f"(incl. compile), steady {t_second:.2f}s")
    ok = spartan.verify(index, srs, [3], proof)
    log(f"spartan verify: {ok}")
    DETAIL[f"spartan_2e{n_cons_log2}_steady_s"] = round(t_second, 2)
    DETAIL[f"spartan_2e{n_cons_log2}_compile_s"] = round(t_first - t_second, 2)
    return t_second


def bench_jolt_e2e():
    """Linked Jolt zkVM (full RV32IM incl. DIV sequence) on a small guest."""
    from co_zkvms_tpu.models.jolt import jolt, rv32i as rv, subtables as ST
    from co_zkvms_tpu.ops import pst13

    ST.set_config(8)
    try:
        srs = pst13.setup_cached(8, seed=21)
        prog = [
            rv.asm("ADDI", rd=1, rs1=0, imm=17),
            rv.asm("ADDI", rd=2, rs1=0, imm=5),
            rv.asm("DIV", rd=3, rs1=1, rs2=2),
            rv.asm("MULH", rd=5, rs1=1, rs2=2),
            rv.asm("SW", rs1=0, rs2=3, imm=0x104),
            rv.asm("LW", rd=6, rs1=0, imm=0x104),
            rv.asm("ECALL"),
        ]
        t0 = time.time()
        proof = jolt.prove(prog, srs, mem_bits=4)
        t_prove = time.time() - t0
        t0 = time.time()
        ok = jolt.verify(proof, prog, srs)
        t_ver = time.time() - t0
        log(f"jolt zkVM e2e (RV32IM guest, 2^6 rows): prove {t_prove:.1f}s "
            f"verify {t_ver:.1f}s ok={ok}")
        DETAIL["jolt_guest_prove_s"] = round(t_prove, 1)
        DETAIL["jolt_guest_verify_s"] = round(t_ver, 1)
    finally:
        ST.set_config(16)


def main():
    import os

    t_start = time.time()
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    log(f"devices: {jax.devices()}")
    mul_rate = None
    try:
        mul_rate = bench_field_mul()
    except Exception as e:  # noqa: BLE001
        log(f"field bench failed: {e}")

    # headline FIRST: the TPU relay worker occasionally crashes under
    # sustained load — retry, and always emit a JSON line even if MSM
    # never completes. Secondary benches (some with multi-minute first
    # compiles) run after, under the soft time budget.
    pps = None
    for attempt in range(3):
        try:
            pps = bench_msm()
            break
        except Exception as e:  # noqa: BLE001
            log(f"msm bench attempt {attempt} failed: {e}")
            time.sleep(45)

    def in_budget(label):
        left = budget - (time.time() - t_start)
        if left <= 0:
            log(f"{label} skipped: bench budget exhausted")
            return False
        return True

    if in_budget("sumcheck"):
        try:
            bench_sumcheck_round()
        except Exception as e:  # noqa: BLE001
            log(f"sumcheck bench failed: {e}")
    if in_budget("ntt"):
        try:
            bench_ntt()
        except Exception as e:  # noqa: BLE001
            log(f"ntt bench failed: {e}")
    if in_budget("poseidon"):
        try:
            bench_poseidon()
        except Exception as e:  # noqa: BLE001
            log(f"poseidon bench failed: {e}")
    if in_budget("spartan"):
        try:
            bench_spartan_e2e(12)
        except Exception as e:  # noqa: BLE001
            log(f"spartan bench failed: {e}")
    if os.environ.get("BENCH_E2E_BIG") and in_budget("spartan-big"):
        try:
            bench_spartan_e2e(20)
        except Exception as e:  # noqa: BLE001
            log(f"spartan 2^20 bench failed: {e}")
    if os.environ.get("BENCH_JOLT") and in_budget("jolt"):
        try:
            bench_jolt_e2e()
        except Exception as e:  # noqa: BLE001
            log(f"jolt bench failed: {e}")

    try:
        with open("BENCH_DETAIL.json", "w") as fh:
            json.dump(DETAIL, fh, indent=1)
        log(f"detail: {json.dumps(DETAIL)}")
    except Exception as e:  # noqa: BLE001
        log(f"detail write failed: {e}")
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
