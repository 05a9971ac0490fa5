"""G1 batched Jacobian ops + MSM vs the Python ground truth."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from co_zkvms_tpu.ops import curve as C
from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import msm as M
from co_zkvms_tpu.ops.field import FR
from co_zkvms_tpu.ops import ref_bn254 as bn


def ref_points(rng, n):
    """n pseudo-random G1 points as (point_obj, (x,y) ints)."""
    pts = []
    for _ in range(n):
        k = rng.randrange(1, bn.R_ORDER)
        pts.append(bn.scalar_mul(bn.G1_GEN, k))
    return pts


def to_device(pts):
    return C.points_from_ints([bn.g1_coords(p) for p in pts])


def test_add_double_matches_reference(rng):
    pts = ref_points(rng, 8)
    qts = ref_points(rng, 8)
    dp = C.from_affine(to_device(pts))
    dq = C.from_affine(to_device(qts))
    got = C.points_to_ints(C.to_affine(C.add(dp, dq)))
    want = [bn.g1_coords(bn.add(p, q)) for p, q in zip(pts, qts)]
    assert got == want
    got_d = C.points_to_ints(C.to_affine(C.double(dp)))
    want_d = [bn.g1_coords(bn.double(p)) for p in pts]
    assert got_d == want_d


def test_add_edge_cases(rng):
    p = ref_points(rng, 1)[0]
    dp = C.from_affine(to_device([p]))
    inf = C.infinity((1,))
    # p + inf = p; inf + p = p
    assert C.points_to_ints(C.to_affine(C.add(dp, inf))) == [bn.g1_coords(p)]
    assert C.points_to_ints(C.to_affine(C.add(inf, dp))) == [bn.g1_coords(p)]
    # p + p = 2p (equal-case select)
    assert C.points_to_ints(C.to_affine(C.add(dp, dp))) == [bn.g1_coords(bn.double(p))]
    # p + (-p) = inf
    got = C.points_to_ints(C.to_affine(C.add(dp, C.neg(dp))))
    assert got == [(0, 0)]
    # mixed-add edge cases
    aff = to_device([p])
    assert C.points_to_ints(C.to_affine(C.add_mixed(inf, aff))) == [bn.g1_coords(p)]
    assert C.points_to_ints(C.to_affine(C.add_mixed(dp, aff))) == [
        bn.g1_coords(bn.double(p))
    ]
    neg_aff = C.APoint(aff.x, F.neg(F.FQ, aff.y))
    assert C.points_to_ints(C.to_affine(C.add_mixed(dp, neg_aff))) == [(0, 0)]


def test_tree_sum(rng):
    pts = ref_points(rng, 7)
    dp = C.from_affine(to_device(pts))
    got = C.points_to_ints(C.to_affine(C.tree_sum(dp)))
    want = None
    for p in pts:
        want = bn.add(want, p)
    assert got == [bn.g1_coords(want)]


@pytest.mark.parametrize("c", [4, 8])
def test_msm_small(rng, c):
    n = 33
    pts = ref_points(rng, n)
    scalars = [rng.randrange(bn.R_ORDER) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    dp = to_device(pts)
    ds = F.from_int(F.FR, scalars)
    got = C.points_to_ints(C.to_affine(M.msm(dp, ds, c=c)))
    want = bn.msm(pts, scalars)
    assert got == [bn.g1_coords(want)]


def test_fixed_base_msm(rng):
    n = 17
    scalars = [rng.randrange(bn.R_ORDER) for _ in range(n)] + [0]
    base = bn.scalar_mul(bn.G1_GEN, 5)
    db = to_device([base])
    db = C.APoint(db.x[0], db.y[0])
    ds = F.from_int(F.FR, scalars)
    got = C.points_to_ints(C.to_affine(M.fixed_base_msm(db, ds, c=8)))
    want = [bn.g1_coords(bn.scalar_mul(base, s)) for s in scalars]
    assert got == want


import jax as _jax


@pytest.mark.skipif(_jax.default_backend() != "tpu",
                    reason="pallas interpret mode is impractically slow on "
                           "CPU; the kernel is validated bit-exactly vs the "
                           "while-loop path on real TPU (.claude notes)")
@pytest.mark.parametrize("c", [4])
def test_fused_bucket_path(rng, c):
    """Fused VMEM bucket kernel == while-loop path (TPU only)."""
    n = 24
    pts = ref_points(rng, n)
    scalars = [rng.randrange(bn.R_ORDER) for _ in range(n)]
    scalars[3] = 0
    dp = to_device(pts)
    ds = F.from_int(F.FR, scalars)
    plan = M._plan_msm(dp, ds, c)
    fetch2 = M._plan_sort(plan, _jax.device_get(plan["fetch"]))
    assert plan["path"] in ("fused", "loop")
    if plan["path"] == "loop":       # n too small for the fused gate:
        plan["path"] = "fused"       # force it — that's what this test is for
        digits = plan["digits"]
        nw = M._n_windows(c)
        dig2, kb, k_split, nb_top = M._top_regroup(digits, c)
        top_row = digits[nw - 1] if k_split == 1 else dig2
        rows = jnp.concatenate([digits[: nw - 1], top_row[None]], axis=0)
        srt, order = M._sort_rows(rows)
        plan.update(ds=srt, order=order, kb=kb, k_split=k_split,
                    nb_top=nb_top)
        fetch2 = {"occs": M._occs_from_sorted(srt, c)}
    occs = [int(v) for v in _jax.device_get(fetch2["occs"])]
    fused = M._window_sums_fused(dp, plan, occs)
    base = M._all_window_sums(dp, M.window_digits(ds, c), c)
    got = C.points_to_ints(C.to_affine(fused))
    want = C.points_to_ints(C.to_affine(base))
    assert got == want


@pytest.mark.skipif(_jax.default_backend() != "tpu",
                    reason="pallas interpret mode is impractically slow on "
                           "CPU; run with COZK_TEST_PLATFORM=tpu")
def test_weighted_sum_split_matches_suffix(rng):
    """The hi/lo digit-split weighted bucket sum == the plain double
    suffix scan, on buckets containing infinities and repeated values
    (the empty-run doubling case that killed the round-4 incomplete
    fold)."""
    c, nw = 6, 3
    nb = 1 << c
    base = bn.G1_GEN
    pts = []
    for w in range(nw):
        row = []
        for b in range(nb):
            if (w * nb + b) % 5 == 0:
                row.append((0, 0))          # empty bucket (infinity)
            else:
                k = 1 + ((w * 31 + b * 7) % 97)
                row.append(bn.g1_coords(bn.scalar_mul(base, k)))
        pts.append(row)
    flat = [xy for row in pts for xy in row]
    ap = C.points_from_ints(flat)
    one = jnp.asarray(F.FQ.one_mont)
    inf_mask = jnp.all(jnp.concatenate([ap.x, ap.y], -1) == 0, axis=-1)
    z = jnp.where(inf_mask[:, None], jnp.zeros((16,), jnp.uint32), one)
    buckets = C.JPoint(ap.x.reshape(nw, nb, 16), ap.y.reshape(nw, nb, 16),
                       z.reshape(nw, nb, 16))
    got = M._weighted_bucket_sum(buckets, c)
    want = M._suffix_weighted(buckets, c, nw, nb)
    assert C.points_to_ints(C.to_affine(got)) == \
        C.points_to_ints(C.to_affine(want))
    # ground truth on one window via host bigints
    acc = None
    for b in range(1, nb):
        if pts[0][b] == (0, 0):
            continue
        k = b * (1 + ((0 * 31 + b * 7) % 97))
        p = bn.scalar_mul(base, k)
        acc = p if acc is None else bn.add(acc, p)
    w0 = C.points_to_ints(C.to_affine(got))[0]
    assert w0 == bn.g1_coords(acc)


def test_window_digits_straddle(rng):
    """Digits assembled across 16-bit limb boundaries (c not dividing 16)
    match the integer definition."""
    scalars = [rng.randrange(bn.R_ORDER) for _ in range(5)]
    sm = F.from_int(F.FR, scalars)
    for c in (7, 10, 12, 16):
        digits = _jax.device_get(M.window_digits(sm, c))
        for i, s in enumerate(scalars):
            for w in range(digits.shape[0]):
                assert int(digits[w, i]) == (s >> (w * c)) & ((1 << c) - 1)


def test_pallas_curve_kernels_match_jnp(rng):
    """The Pallas kernel BODIES (run eagerly via fake refs — pallas interpret
    mode spends >10 min compiling the unrolled graph on CPU) bit-equal the
    jnp formulas, including the squaring-specialized (_msq) paths and the
    edge cases (equal points, p + (-p), infinity operands)."""
    from co_zkvms_tpu.ops import curve_pallas as CP
    from co_zkvms_tpu.ops import field_pallas as FP

    class Ref:
        def __init__(self, arr=None, n=None):
            self.a = ([None] * 16 if arr is None
                      else [arr[i] for i in range(16)])

        def __getitem__(self, key):
            i, _ = key
            return self.a[i]

        def __setitem__(self, key, val):
            i, _ = key
            self.a[i] = val

        def limbs(self):
            return jnp.stack(self.a, axis=-1)

    def t(x):  # [N, 16] -> limb-major fake ref
        return Ref(jnp.moveaxis(x, -1, 0))

    mod, one, n0 = CP._consts()

    pts = ref_points(rng, 14)
    qts = ref_points(rng, 14)
    p_aff = to_device(pts)
    q_aff = to_device(qts)
    pj = C.from_affine(p_aff)
    qj = C.from_affine(q_aff)
    # rows 14,15: p == q (doubling branch); build q_ext with one negated
    # row (p + (-p) = infinity) appended as well
    pj = jax.tree.map(lambda a, b: jnp.concatenate([a, b[:2]]), pj, qj)
    q_ext = jax.tree.map(lambda a, b: jnp.concatenate([a, b[:2]]),
                         q_aff, C.to_affine(jax.tree.map(lambda v: v[:2], qj)))
    q_ext = C.APoint(q_ext.x, jnp.concatenate(
        [q_ext.y[:-1], F.neg(F.FQ, q_ext.y[-1:])]))

    ox, oy, oz = Ref(), Ref(), Ref()
    CP._add_mixed_kernel(t(pj.x), t(pj.y), t(pj.z), t(q_ext.x), t(q_ext.y),
                         ox, oy, oz, mod, one, n0)
    got = C.JPoint(ox.limbs(), oy.limbs(), oz.limbs())
    want = C.add_mixed(pj, q_ext)
    assert C.points_to_ints(C.to_affine(got)) == C.points_to_ints(
        C.to_affine(want))

    qj_ext = C.from_affine(q_ext)
    ox, oy, oz = Ref(), Ref(), Ref()
    CP._add_kernel(t(pj.x), t(pj.y), t(pj.z),
                   t(qj_ext.x), t(qj_ext.y), t(qj_ext.z),
                   ox, oy, oz, mod, one, n0)
    got = C.JPoint(ox.limbs(), oy.limbs(), oz.limbs())
    want = C.add(pj, qj_ext)
    assert C.points_to_ints(C.to_affine(got)) == C.points_to_ints(
        C.to_affine(want))

    ox, oy, oz = Ref(), Ref(), Ref()
    CP._double_kernel(t(pj.x), t(pj.y), t(pj.z), ox, oy, oz, mod, n0)
    got = C.JPoint(ox.limbs(), oy.limbs(), oz.limbs())
    want = C.double(pj)
    assert C.points_to_ints(C.to_affine(got)) == C.points_to_ints(
        C.to_affine(want))


@pytest.mark.slow
def test_msm_by_value_counter_path(rng):
    """Counter-poly fast path: group-by-scalar-value + tiny MSM equals the
    windowed baseline on skewed small-valued scalars (the Lasso read/final
    counter commit shape)."""
    from co_zkvms_tpu.ops import ref_bn254 as bn

    n = 256
    g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
    g1 = C.APoint(g.x[0], g.y[0])
    exps = F.random(FR, jax.random.key(40), (n,))
    pts = C.to_affine(M.fixed_base_msm(g1, exps))
    # counter-like scalars: mostly 0/1, a few larger, heavy multiplicity
    vals = [rng.choice([0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 7]) for _ in range(n)]
    scalars = F.from_int(FR, vals)
    std = F.from_mont(FR, scalars)
    small, distinct = jax.device_get(M._small_value_stats(std))
    assert bool(small) and int(distinct) <= 8
    sums, c2 = M._by_value_sums(pts, std[:, 0], 32)
    got = M._horner_host(sums, c2)
    want = M._horner_host(
        M._all_window_sums(pts, M.window_digits(scalars, 8), 8), 8)
    assert C.points_to_ints(C.to_affine(got)) == \
        C.points_to_ints(C.to_affine(want))


@pytest.mark.slow
def test_msm_batch_ints_matches_per_call(rng):
    """msm_batch_ints over heterogeneous jobs == per-call msm(): mixed
    sizes, counter-valued scalars, all-zero scalars (infinity results),
    and chunk boundaries (chunk=3 over 8 jobs exercises the aff offset
    bookkeeping across several flush rounds)."""
    from co_zkvms_tpu.ops import ref_bn254 as bn

    g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
    g1 = C.APoint(g.x[0], g.y[0])

    def mk_job(n, kind, seed):
        exps = F.random(FR, jax.random.key(seed), (n,))
        pts = C.to_affine(M.fixed_base_msm(g1, exps))
        if kind == "zero":
            sc = F.from_int(FR, [0] * n)
        elif kind == "counter":
            sc = F.from_int(FR, [rng.choice([0, 1, 1, 2, 5])
                                 for _ in range(n)])
        else:
            sc = F.random(FR, jax.random.key(seed + 1000), (n,))
        return pts, sc

    jobs = [
        mk_job(16, "rand", 1), mk_job(64, "counter", 2),
        mk_job(24, "zero", 3), mk_job(160, "rand", 4),
        mk_job(16, "rand", 5), mk_job(96, "counter", 6),
        mk_job(32, "rand", 7), mk_job(48, "zero", 8),
    ]
    got = M.msm_batch_ints(jobs, chunk=3)
    want = [C.points_to_ints(C.to_affine(M.msm(p, s)))[0] for p, s in jobs]
    assert got == want


def test_batch_chunks_budget():
    """_batch_chunks respects both the job-count cap and the element
    budget (a run never mixes enough large jobs to blow digit memory)."""

    class _Fake:
        def __init__(self, n):
            self.x = jnp.zeros((n, 16), jnp.uint32)

    jobs = [((_Fake(1 << 14)), None) for _ in range(6)]
    runs = M._batch_chunks(jobs, chunk=64, budget_elems=1_250_000)
    assert [len(r) for r in runs] == [2, 2, 2]     # budget-bound
    assert sum(len(r) for r in runs) == 6
    jobs = [((_Fake(16)), None) for _ in range(10)]
    runs = M._batch_chunks(jobs, chunk=4)
    assert [len(r) for r in runs] == [4, 4, 2]     # count-bound


@pytest.mark.skipif(_jax.default_backend() != "tpu",
                    reason="pallas interpret mode is impractically slow on "
                           "CPU; covered on hardware by this test + "
                           "tools/msm_size_sweep.py (empty-bucket styles)")
def test_weighted_sum_empty_bucket_runs(rng):
    """Round-4 regression guard for the weighted-sum suffix scan.

    With a run of EMPTY buckets the suffix-cumulative values are constant
    across the run, so the second fold adds two EQUAL group elements — the
    doubling case an incomplete addition drops. Exercises
    _weighted_bucket_sum directly (interpret mode) on bucket arrays with
    empty runs and checks against a host reference."""
    import numpy as np
    import jax as _j

    nw, c = 2, 3
    nb = 1 << c
    pts = ref_points(rng, 3)
    # window 0: buckets 2 and 5 occupied, rest empty (runs of empties);
    # window 1: only bucket 6 occupied (constant suffix below it)
    occupied = {(0, 2): pts[0], (0, 5): pts[1], (1, 6): pts[2]}
    bx = np.zeros((nw, nb, 16), np.uint32)
    by = np.zeros((nw, nb, 16), np.uint32)
    bz = np.zeros((nw, nb, 16), np.uint32)
    for (w, b), pt in occupied.items():
        jp = C.from_affine(to_device([pt]))
        bx[w, b] = np.asarray(_j.device_get(jp.x[0]))
        by[w, b] = np.asarray(_j.device_get(jp.y[0]))
        bz[w, b] = np.asarray(_j.device_get(jp.z[0]))
    buckets = C.JPoint(jnp.asarray(bx), jnp.asarray(by), jnp.asarray(bz))
    got = C.points_to_ints(C.to_affine(M._weighted_sum_jit(buckets, c)))
    want = []
    for w in range(nw):
        acc = None
        for b in range(nb):
            if (w, b) in occupied:
                term = bn.scalar_mul(occupied[(w, b)], b)
                acc = term if acc is None else bn.add(acc, term)
        want.append(bn.g1_coords(acc) if acc is not None else (0, 0))
    assert got == want
