"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: variable-base MSM throughput (points/s/chip) at the largest
configuration that SURVIVES the chip — tried in a degrade ladder from the
tuned config (n=2^20) down to the known-good floor (n=2^16, c=8). The MSM
is the kernel the reference pipeline is bound by (BASELINE.md: party-side
PST13 ``batch_msm`` = 144.5 s of a 344 s co-Jolt proof).

vs_baseline: the reference gives no direct MSM ops/s number; we derive an
estimate from its committed trace: sha2-chain x300 => trace length ~2^20,
Jolt commits O(100) polynomials of that length per party, so ~1e8 points in
144.5 s ~= 7e5 points/s on the 32-CPU host. vs_baseline = ours / 7e5.

Crash isolation: every bench runs in its OWN subprocess (`--sub <name>`),
so a TPU-worker crash or a wedged compile kills one config, not the whole
suite (round 3 lost every number to one 2^20 crash). Results stream back as
SUB_RESULT JSON lines; the parent aggregates into BENCH_DETAIL.json.

A persistent compile cache (.jax_cache_tpu, keyed by jax/platform) is shared
by all subprocesses so multi-minute Mosaic compiles are paid once per
machine, not once per bench run.

Secondary lines (stderr + BENCH_DETAIL.json, the BASELINE.json set):
- field-mul throughput + roofline % (HBM-bandwidth model: a dependent
  Montgomery mul streams 3 x 64 B per element at ~820 GB/s on v5e);
- MSM roofline % (point-adds/s vs the flat field-mul rate);
- sumcheck round throughput (elements/s, degree-3 4-table comb at 2^20);
- NTT / Poseidon throughput + mul-rate rooflines;
- e2e proof latencies: Spartan 2^12 AND 2^20 (at-scale, default-on),
  linked Jolt zkVM guest (loop guest, >= 2^12 trace rows via BENCH_JOLT);
- multichip scaling: measured separately by the driver via
  __graft_entry__.dryrun_multichip (virtual mesh; ICI numbers need a pod).
"""

import json
import os
import subprocess
import sys
import time

REF_MSM_POINTS_PER_S = 7.0e5  # documented estimate, see module docstring
HBM_GBPS = 819.0              # v5e HBM bandwidth (spec)
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache_tpu")
DETAIL = {}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _sync_limb(x):
    """Force completion through the TPU relay (block_until_ready lies)."""
    import jax
    import jax.numpy as jnp

    return int(jax.device_get(jnp.ravel(x)[0]))


def _emit(result):
    """Child -> parent result channel (one tagged JSON line on stdout)."""
    print("SUB_RESULT " + json.dumps(result), flush=True)


# --------------------------------------------------------------------------
# subprocess bodies (each runs with a fresh TPU client)
# --------------------------------------------------------------------------


def sub_field_mul(n_log2=20, chain=200):
    """Dependent-modmul throughput, three views:

    - fused-chain (the headline): ``chain`` dependent muls inside ONE
      jitted program — the shape of every real kernel (a Poseidon
      permutation is 828 muls/element, a sumcheck round fold dozens); XLA
      cancels the kernel-boundary limb transposes between dependent muls.
    - limb-major: the Pallas kernel alone (no layout conversion at all).
    - single-call: one un-fused F.mul — pays both boundary transposes
      (~13 ms each at 2^20); reported so the overhead is visible, NOT the
      headline (nothing hot calls muls that way)."""
    import jax
    import jax.numpy as jnp
    from co_zkvms_tpu.ops import field as F
    from co_zkvms_tpu.ops import field_pallas as FP
    from co_zkvms_tpu.ops.field import FR

    n = 1 << n_log2
    a = F.random(FR, jax.random.key(1), (n,))
    b = F.random(FR, jax.random.key(2), (n,))
    ideal = HBM_GBPS * 1e9 / (3 * 64)   # 64 B read x2 + write per element

    @jax.jit
    def chain_fn(x, y):
        for _ in range(chain):
            x = F.mul(FR, x, y)
        return x

    _sync_limb(chain_fn(a, b))
    t0 = time.time()
    _sync_limb(chain_fn(a, b))
    rate = n * chain / (time.time() - t0)
    pct = 100.0 * rate / ideal

    a_t, b_t = a.T.copy(), b.T.copy()

    @jax.jit
    def chain_lm(x_t, y_t):
        for _ in range(chain):
            x_t = FP.mul_limb_major(FR, x_t, y_t)
        return x_t

    _sync_limb(chain_lm(a_t, b_t))
    t0 = time.time()
    _sync_limb(chain_lm(a_t, b_t))
    rate_lm = n * chain / (time.time() - t0)

    out1 = F.mul(FR, a, b)
    _sync_limb(out1)
    t0 = time.time()
    for _ in range(10):
        out1 = F.mul(FR, out1, b)
    _sync_limb(out1)
    rate1 = n / ((time.time() - t0) / 10)
    log(f"field mul n=2^{n_log2}: fused-chain {rate/1e6:.1f} Mmul/s "
        f"({pct:.1f}% of HBM roofline {ideal/1e6:.0f} Mmul/s); "
        f"limb-major kernel {rate_lm/1e6:.1f} Mmul/s "
        f"({100*rate_lm/ideal:.1f}%); single-call {rate1/1e6:.1f} Mmul/s")
    _emit({"field_mul_per_s": round(rate),
           "field_mul_roofline_pct": round(pct, 1),
           "field_mul_kernel_per_s": round(rate_lm),
           "field_mul_kernel_roofline_pct": round(100 * rate_lm / ideal, 1),
           "field_mul_single_call_per_s": round(rate1)})


def sub_msm(n_log2, c=0):
    import jax
    from co_zkvms_tpu.ops import curve as C
    from co_zkvms_tpu.ops import field as F
    from co_zkvms_tpu.ops import msm as M
    from co_zkvms_tpu.ops import ref_bn254 as bn
    from co_zkvms_tpu.ops.field import FR

    c = c or None
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
    for _ in range(3):
        t0 = time.time()
        res = M.msm(pts, scalars, c=c)
        _sync_limb(res.x)
        times.append(time.time() - t0)
    best = min(times)
    pps = n / best
    nw = M._n_windows(c_eff)
    log(f"msm n=2^{n_log2} c={c_eff}: best {best:.3f}s -> {pps:,.0f} pts/s")
    _emit({"msm_points_per_s": round(pps),
           "msm_config": {"n_log2": n_log2, "c": c_eff, "nw": nw},
           "msm_warmup_s": round(warm, 1)})


def sub_sumcheck(n_log2=20):
    """Degree-3 4-table comb (the GKR/outer-Spartan inner loop): full prove
    over 2^n elements; reports elements/s across all rounds and the
    bandwidth roofline of the dominant first round."""
    import jax
    from co_zkvms_tpu.ops import field as F
    from co_zkvms_tpu.ops import poly as P
    from co_zkvms_tpu.ops import sumcheck as SC
    from co_zkvms_tpu.ops import transcript as T
    from co_zkvms_tpu.ops.field import FR

    n = 1 << n_log2
    polys = [F.random(FR, jax.random.key(10 + i), (n,)) for i in range(4)]
    state = T.HostTranscript(b"bench").device_state()

    def comb(ps):
        eq, az, bz, cz = ps
        return F.mul(FR, eq, F.sub(FR, F.mul(FR, az, bz), cz))

    comb.lv = lambda f, ps: f.mul(ps[0], f.sub(f.mul(ps[1], ps[2]), ps[3]))

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
        f"eq-in-comb {times[False]:.3f}s ({times[False]/dt:.2f}x) -> "
        f"{rate/1e6:.1f} M elements/s ({pct:.1f}% of HBM roofline)")
    _emit({"sumcheck_elems_per_s": round(rate),
           "sumcheck_roofline_pct": round(pct, 1),
           "sumcheck_split_eq_speedup": round(times[False] / dt, 2)})


def sub_ntt(n_log2=20):
    """Radix-2 NTT over Fr: full transform throughput."""
    import jax
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
    log(f"ntt 2^{n_log2}: {dt*1e3:.1f}ms -> {rate/1e6:.2f} M elems/s")
    _emit({"ntt_elems_per_s": round(rate), "ntt_n_log2": n_log2})


def sub_poseidon(n_log2=18):
    """Batched Poseidon t=3 (2-to-1): hashes/s."""
    import jax
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
    log(f"poseidon 2^{n_log2} hashes: {dt*1e3:.1f}ms -> "
        f"{rate/1e6:.2f} M hash/s")
    _emit({"poseidon_hashes_per_s": round(rate)})


def sub_spartan(n_cons_log2=12):
    from co_zkvms_tpu.models import spartan
    from co_zkvms_tpu.models.synthetic import squaring_chain
    from co_zkvms_tpu.ops import pst13

    b = squaring_chain((1 << n_cons_log2) - 4)
    z = b.solve_witness([3])
    index = spartan.SpartanIndex.from_r1cs(b.build())
    srs = pst13.setup_cached(index.nv, seed=7)
    # emit after EVERY milestone: a parent-side timeout keeps the last line
    t0 = time.time()
    proof = spartan.prove(index, srs, z)
    t_first = time.time() - t0
    log(f"spartan e2e 2^{n_cons_log2}: first prove {t_first:.2f}s "
        f"(incl. compile)")
    res = {f"spartan_2e{n_cons_log2}_first_s": round(t_first, 2)}
    _emit(res)
    ok = spartan.verify(index, srs, [3], proof)
    log(f"spartan verify: {ok}")
    res[f"spartan_2e{n_cons_log2}_verify_ok"] = bool(ok)
    _emit(res)
    t0 = time.time()
    proof = spartan.prove(index, srs, z)
    t_second = time.time() - t0
    log(f"spartan e2e 2^{n_cons_log2}: steady {t_second:.2f}s")
    res[f"spartan_2e{n_cons_log2}_steady_s"] = round(t_second, 2)
    res[f"spartan_2e{n_cons_log2}_compile_s"] = round(t_first - t_second, 2)
    _emit(res)


def sub_jolt():
    """Linked Jolt zkVM e2e at PRODUCTION geometry (WORD=32, M=2^16) on the
    committed sha2-chain guest ELF — the reference's own headline workload
    (BASELINE.md: sha2-chain x1 = 10.2 s MPC prove on a 32-CPU host). The
    guest is a real SHA-256 compression (~3.7k trace rows); the revealed
    JoltDevice outputs must equal the hashlib digest."""
    import hashlib
    import struct

    from co_zkvms_tpu.models.jolt import elf as E, jolt
    from co_zkvms_tpu.ops import pst13

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "examples/guests/sha2_chain_1.elf"),
              "rb") as fh:
        img = E.load_guest(fh.read())
    msg = b"".join(struct.pack(">I", w) for w in (1, 2, 3, 4, 5, 6, 7, 8))
    digest = list(struct.unpack(">8I", hashlib.sha256(msg).digest()))
    t0 = time.time()
    srs = pst13.setup_cached(16, seed=33)   # covers M=2^16 final counters
    t_setup = time.time() - t0
    # emit after EVERY milestone: a parent-side timeout keeps the last line
    res = {"jolt_sha2_rows": 3667, "jolt_sha2_vs_ref_mpc_s": 10.2}
    t0 = time.time()
    proof = jolt.prove(img.program_words, srs, mem_bits=5,
                       max_steps=1 << 13, code_base=img.code_base,
                       out_bits=3)
    t_prove = time.time() - t0
    log(f"jolt prove (first, incl. compile): {t_prove:.1f}s")
    res["jolt_sha2_prove_s"] = round(t_prove, 1)
    _emit(res)
    t0 = time.time()
    ok = jolt.verify(proof, img.program_words, srs)
    t_ver = time.time() - t0
    ok = ok and list(proof.outputs) == digest
    res["jolt_sha2_verify_s"] = round(t_ver, 1)
    res["jolt_sha2_ok"] = bool(ok)
    _emit(res)
    t0 = time.time()
    proof2 = jolt.prove(img.program_words, srs, mem_bits=5,
                        max_steps=1 << 13, code_base=img.code_base,
                        out_bits=3)
    t_prove2 = time.time() - t0
    log(f"jolt zkVM e2e (sha2-chain x1 ELF, ~3.7k rows, WORD=32): "
        f"setup {t_setup:.1f}s prove {t_prove:.1f}s (steady {t_prove2:.1f}s) "
        f"verify {t_ver:.1f}s ok={ok}")
    res["jolt_sha2_prove_steady_s"] = round(t_prove2, 1)
    _emit(res)


SUBS = {
    "field_mul": sub_field_mul,
    "msm": sub_msm,
    "sumcheck": sub_sumcheck,
    "ntt": sub_ntt,
    "poseidon": sub_poseidon,
    "spartan": sub_spartan,
    "jolt": sub_jolt,
}


# --------------------------------------------------------------------------
# parent orchestration
# --------------------------------------------------------------------------


def run_sub(name, args=(), timeout=900):
    """Run one bench in a subprocess; returns its SUB_RESULT dict or None.

    A crash (TPU worker died, segfault, OOM) or a wedged compile kills only
    this subprocess; the parent moves on to the next bench/config."""
    cmd = [sys.executable, os.path.abspath(__file__), "--sub", name]
    cmd += [str(a) for a in args]
    env = os.environ.copy()
    env.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)
    label = f"{name}({','.join(str(a) for a in args)})"
    log(f"--- bench {label} (timeout {timeout}s)")
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, env=env, timeout=timeout,
                              stdout=subprocess.PIPE, stderr=sys.stderr)
        out = proc.stdout.decode(errors="replace")
        rc = proc.returncode
    except subprocess.TimeoutExpired as exc:
        # harvest whatever the sub already emitted — every sub _emit()s
        # after each milestone precisely so a timeout still yields numbers
        log(f"bench {label} TIMED OUT after {timeout}s (keeping any "
            f"partial SUB_RESULT)")
        out = (exc.stdout or b"").decode(errors="replace")
        rc = "timeout"
    result = None
    for line in out.splitlines():
        if line.startswith("SUB_RESULT "):
            result = json.loads(line[len("SUB_RESULT "):])
    if rc not in (0, "timeout"):
        log(f"bench {label} exited rc={rc} after {time.time()-t0:.0f}s")
    return result


def main():
    t_start = time.time()
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    os.makedirs(CACHE_DIR, exist_ok=True)

    def left():
        return budget - (time.time() - t_start)

    # headline FIRST — it must never be squeezed by a slow secondary:
    # degrade ladder, tuned config first, then smaller until one survives.
    # NEVER emit nothing (round-3 failure mode).
    msm_ladder = [(20, 0), (18, 0), (16, 8)]
    pps = None
    for n_log2, c in msm_ladder:
        res = run_sub("msm", (n_log2, c),
                      timeout=min(1200, max(300, left())))
        if res and res.get("msm_points_per_s"):
            DETAIL.update(res)
            pps = res["msm_points_per_s"]
            if (n_log2, c) != msm_ladder[0]:
                DETAIL["msm_degraded"] = True
                log(f"msm DEGRADED to n=2^{n_log2}: the tuned config "
                    f"crashed or timed out — headline is the largest "
                    f"surviving config")
            break

    res = run_sub("field_mul", timeout=min(900, max(120, left())))
    mul_rate = None
    if res:
        DETAIL.update(res)
        mul_rate = res.get("field_mul_per_s")
    if pps and mul_rate:
        nw = DETAIL["msm_config"]["nw"]
        roofline_pps = mul_rate / (nw * 12.0)
        pct = 100.0 * pps / roofline_pps
        DETAIL["msm_roofline_pct"] = round(pct, 1)
        log(f"msm roofline: {pct:.1f}% of field-mul-rate bound "
            f"({roofline_pps:,.0f} pts/s ideal at {nw} windows)")

    secondary = [
        ("sumcheck", (), 600),
        ("ntt", (), 400),
        ("poseidon", (), 400),
        ("spartan", (12,), 600),
        ("spartan", (20,), 900),
        ("jolt", (), 1200),
    ]
    for name, args, to in secondary:
        if left() <= 30:
            log(f"{name}{args} skipped: bench budget exhausted")
            continue
        res = run_sub(name, args, timeout=min(to, max(60, left())))
        if res:
            DETAIL.update(res)

    # mul-rate rooflines for secondary kernels
    if mul_rate:
        if DETAIL.get("ntt_elems_per_s"):
            nlg = DETAIL.get("ntt_n_log2", 20)
            ideal = mul_rate / (nlg / 2)
            DETAIL["ntt_roofline_pct"] = round(
                100.0 * DETAIL["ntt_elems_per_s"] / ideal, 1)
        if DETAIL.get("poseidon_hashes_per_s"):
            ideal = mul_rate / 828.0
            DETAIL["poseidon_roofline_pct"] = round(
                100.0 * DETAIL["poseidon_hashes_per_s"] / ideal, 1)

    try:
        with open("BENCH_DETAIL.json", "w") as fh:
            json.dump(DETAIL, fh, indent=1)
        log(f"detail: {json.dumps(DETAIL)}")
    except Exception as e:  # noqa: BLE001
        log(f"detail write failed: {e}")

    if pps is not None:
        line = {"metric": "msm_points_per_s_per_chip", "value": round(pps),
                "unit": "points/s",
                "vs_baseline": round(pps / REF_MSM_POINTS_PER_S, 3)}
        if DETAIL.get("msm_degraded"):
            line["degraded_config"] = DETAIL["msm_config"]
    else:
        # LOUD fallback: different metric, different baseline (reference's
        # ~50 Mmul/s on a 32-core CPU host; arkworks ~1.5M mul/s/core).
        # NOT comparable to msm vs_baseline numbers from other rounds.
        log("WARNING: headline MSM never completed at ANY ladder config; "
            "falling back to the field-mul metric (vs CPU mul rate — not "
            "comparable to msm_points_per_s_per_chip rounds)")
        line = {"metric": "field_mul_per_s_per_chip",
                "value": round(mul_rate or 0), "unit": "mulmod/s",
                "vs_baseline": round((mul_rate or 0) / 5.0e7, 3),
                "fallback_from": "msm_points_per_s_per_chip"}
    print(json.dumps(line))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--sub":
        import jax

        # set the persistent compile cache EXPLICITLY: this environment's
        # sitecustomize imports jax before the env var is visible to its
        # config layer, so JAX_COMPILATION_CACHE_DIR alone is silently
        # ignored — which made every driver bench sub recompile from
        # scratch (r4's spartan/jolt timeouts; 450 s msm warmups with a
        # fully warmed cache directory sitting right there)
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        if os.environ.get("BENCH_PLATFORM"):
            # JAX_PLATFORMS is latched to the TPU plugin at interpreter
            # start by this environment's sitecustomize; tests force CPU
            # through the config instead
            jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
        name = sys.argv[2]
        args = [int(a) for a in sys.argv[3:]]
        SUBS[name](*args)
    else:
        main()
