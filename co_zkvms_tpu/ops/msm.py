"""Multi-scalar multiplication on TPU: Pippenger with sorted buckets.

The reference's proving pipeline is MSM-bound (PST13 ``batch_msm`` = 144 s of
a 344 s co-Jolt proof; BASELINE.md). This is the TPU-native formulation:

- window digits extracted from standard-form scalars (c-bit windows aligned
  to the 16-bit limb layout);
- per window: points are argsorted by bucket id so each bucket's points are a
  contiguous run; buckets accumulate in parallel (one batched ``add_mixed``
  of width 2^c per step of a ``while_loop`` over the longest run) — work is
  O(N) per window like serial Pippenger but each step is a full-width
  vector op;
- the weighted bucket sum uses the suffix-sum identity
  sum_b b*S_b = sum_{b>=1} suffix(S)_b, computed with a Hillis-Steele
  suffix scan (c batched adds) + a log-depth tree sum;
- windows combine by Horner (c doublings + 1 add each, batch-1 — negligible).

Every per-window kernel is jitted once and reused across all windows (the
shapes are identical), so MSM cost is pure device time after warmup.

Capability parity: arkworks VariableBaseMSM / fixed-base MSM as used by the
reference's PST13 commit path (co-spartan/src/worker.rs:801-804).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import field as F
from .field import FR, FQ
from . import curve as C
from . import curve_pallas as CP
from .curve import APoint, JPoint

SCALAR_BITS = 254


def _n_windows(c: int) -> int:
    return (SCALAR_BITS + c - 1) // c


@functools.partial(jax.jit, static_argnums=1)
def window_digits(scalars_mont, c: int):
    """Montgomery-form Fr scalars [N, 16] -> window digits [n_windows, N] u32.

    Any c <= 16: a digit's bits [w*c, w*c + c) may straddle a 16-bit limb
    boundary, in which case it is assembled from the two covering limbs.
    (Bucket-count tuning is the main MSM perf lever — see msm() — so the
    window size must not be quantized to divisors of the limb width.)
    """
    assert 1 <= c <= 16
    std = F.from_mont(FR, scalars_mont)  # [N, 16] standard-form limbs
    mask = jnp.uint32((1 << c) - 1)
    outs = []
    for w in range(_n_windows(c)):
        bit0 = w * c
        limb, off = bit0 // 16, bit0 % 16
        d = std[..., limb] >> jnp.uint32(off)
        if off + c > 16 and limb + 1 < 16:
            d = d | (std[..., limb + 1] << jnp.uint32(16 - off))
        outs.append(d & mask)
    return jnp.stack(outs, axis=0)


@functools.partial(jax.jit, static_argnums=2)
def _all_window_sums(points: APoint, digits, c: int) -> JPoint:
    """Weighted bucket sums for ALL windows at once. Returns JPoint [nw].

    Sorting/bucketing runs per window but every point-add is batched across
    all nw * 2^c buckets — one while_loop iteration touches the whole fleet
    of buckets, so sequential step count is max-bucket-occupancy, not
    windows * occupancy (tiny-op dispatch overhead was the bottleneck).
    """
    nw, n = digits.shape
    nb = 1 << c
    order = jnp.argsort(digits, axis=1)                      # [nw, n]
    ds = jnp.take_along_axis(digits, order, axis=1)
    bucket_ids = jnp.arange(nb, dtype=digits.dtype)
    first = jax.vmap(lambda row: jnp.searchsorted(row, bucket_ids, side="left"))(ds)
    last = jax.vmap(lambda row: jnp.searchsorted(row, bucket_ids, side="right"))(ds)
    # bucket 0 is dropped from the weighted sum — never accumulate it (zero
    # scalars are common: zero-padded tables, sparse counters)
    last = last.at[:, 0].set(first[:, 0])

    buckets0 = C.infinity((nw, nb))
    zero_aff = APoint(F.zeros((nw, nb)), F.zeros((nw, nb)))

    def cond(carry):
        t, _ = carry
        return jnp.any(first + t < last)

    def body(carry):
        t, buckets = carry
        idx = jnp.clip(first + t, 0, n - 1)                  # [nw, nb]
        valid = (first + t) < last
        orig = jnp.take_along_axis(order, idx, axis=1)       # [nw, nb]
        q = APoint(points.x[orig], points.y[orig])           # [nw, nb, 16]
        q = jax.tree.map(lambda a, b: F._select(valid, a, b), q, zero_aff)
        return (t + 1, C.add_mixed(buckets, q))

    _, buckets = jax.lax.while_loop(cond, body, (jnp.int32(0), buckets0))

    def _suffix_fold(t):
        """t_b <- sum_{j>=b} t_j along axis 1; fori traces add() once."""
        inf = C.infinity((nw, nb))
        pos = jnp.arange(nb, dtype=jnp.int32)[None, :]

        def level(l, t):
            s = jnp.left_shift(jnp.int32(1), l)
            idx = jnp.broadcast_to(jnp.clip(pos + s, 0, nb - 1), (nw, nb))
            valid = jnp.broadcast_to(pos + s < nb, (nw, nb))
            partner = JPoint(
                jnp.take_along_axis(t.x, idx[..., None], axis=1),
                jnp.take_along_axis(t.y, idx[..., None], axis=1),
                jnp.take_along_axis(t.z, idx[..., None], axis=1),
            )
            partner = jax.tree.map(
                lambda a, b: F._select(valid, a, b), partner, inf
            )
            return C.add(t, partner)

        return jax.lax.fori_loop(0, c, level, t)

    # weighted sum: sum_b b*S_b = sum_{b>=1} suffix(S)_b
    t = _suffix_fold(buckets)
    t = jax.tree.map(
        lambda a, b: a.at[:, 0].set(b[:, 0]), t, C.infinity((nw, nb))
    )  # drop T_0
    total = _suffix_fold(t)
    return JPoint(total.x[:, 0], total.y[:, 0], total.z[:, 0])


@functools.partial(jax.jit, static_argnums=(2, 3))
def _dense_grid(pts32, digits_w, c: int, r_rows: int):
    """One window's points scattered into a dense [R, 16, nb] layout.

    Row t, column b holds the t-th point of bucket b (transposed limb
    layout for the Pallas kernel); empty slots are zero-encoded (the
    complete add treats (0,0) as infinity).

    The naive formulation — one gather of R*nb random 64 B point rows — is
    DMA-descriptor-bound (~23 ns/row measured: 57 ms per window at 2^20,
    dwarfing the add kernel). Instead: ONE random row gather puts the
    points in bucket order (``pts32``: x||y limbs interleaved, so the rows
    are 128 B — half the descriptors), and the grid is then nb contiguous
    R-row SLICES of the sorted array (bucket b's occupants are the run
    [first_b, first_b + count_b)), i.e. sequential DMA at memory bandwidth.
    """
    n = digits_w.shape[0]
    nb = 1 << c
    order = jnp.argsort(digits_w)
    sorted32 = jnp.take(pts32, order, axis=0)   # the one random gather
    sorted32 = jnp.pad(sorted32, ((0, r_rows), (0, 0)))  # slice overrun pad
    ds = digits_w[order]
    bucket_ids = jnp.arange(nb, dtype=digits_w.dtype)
    first = jnp.searchsorted(ds, bucket_ids, side="left")       # [nb]
    count = jnp.searchsorted(ds, bucket_ids, side="right") - first
    count = count.at[0].set(0)          # bucket 0 never accumulates
    slabs = jax.vmap(
        lambda s: jax.lax.dynamic_slice(sorted32, (s, 0), (r_rows, 32))
    )(first)                                                    # [nb, R, 32]
    valid = jnp.arange(r_rows, dtype=jnp.int32)[None, :] < count[:, None]
    slabs = jnp.where(valid[:, :, None], slabs, 0)
    # [nb, R, 32] -> [R, 16, nb] per coordinate
    qx = jnp.transpose(slabs[:, :, :16], (1, 2, 0))
    qy = jnp.transpose(slabs[:, :, 16:], (1, 2, 0))
    return qx, qy, jnp.max(count)


_UNROLL = 4
_LANES = 4096


@jax.jit
def _sort_rows(rows):
    """Batched digit sort carrying the permutation: [k, N] u32 ->
    (sorted digits [k, N], order [k, N] u32) in ONE lax.sort (the old
    per-window in-scan argsorts plus the scatter-add occupancy histogram
    together cost ~0.7 s of a 2.2 s 2^20 MSM)."""
    n = rows.shape[1]
    iot = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32)[None], rows.shape)
    ds, order = jax.lax.sort((rows, iot), dimension=1, num_keys=1)
    return ds, order


@functools.partial(jax.jit, static_argnums=1)
def _occs_from_sorted(ds, c: int):
    """Per-row max bucket occupancy (bucket 0 excluded) from SORTED digit
    rows, as the max run length of equal nonzero values: one cummax sweep
    (vmapped searchsorted over 2^c ids measured ~67 ms at 2^20/22 rows;
    this is bandwidth-bound at ~3 passes). Replaces the scatter-add
    histogram (180 ms)."""
    del c
    n = ds.shape[1]
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], ds.shape)
    change = jnp.concatenate(
        [jnp.ones(ds[:, :1].shape, bool), ds[:, 1:] != ds[:, :-1]], axis=1)
    start = jax.lax.cummax(jnp.where(change, pos, -1), axis=1)
    runlen = pos - start + 1
    runlen = jnp.where(ds == 0, 0, runlen)
    return jnp.max(runlen, axis=1)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _dense_grid_sorted(pts32, ds_w, order_w, c: int, r_rows: int):
    """One window's dense [R, 16, nb] grid from PRE-sorted digits.

    Same layout contract as _dense_grid, but the argsort happened once for
    all windows in _sort_rows: here only the one random row gather (128 B
    rows), the contiguous per-bucket slab slices, and the transpose."""
    nb = 1 << c
    sorted32 = jnp.take(pts32, order_w, axis=0)   # the one random gather
    sorted32 = jnp.pad(sorted32, ((0, r_rows), (0, 0)))
    bucket_ids = jnp.arange(nb, dtype=ds_w.dtype)
    first = jnp.searchsorted(ds_w, bucket_ids, side="left")       # [nb]
    count = jnp.searchsorted(ds_w, bucket_ids, side="right") - first
    count = count.at[0].set(0)          # bucket 0 never accumulates
    slabs = jax.vmap(
        lambda s: jax.lax.dynamic_slice(sorted32, (s, 0), (r_rows, 32))
    )(first)                                                    # [nb, R, 32]
    valid = jnp.arange(r_rows, dtype=jnp.int32)[None, :] < count[:, None]
    slabs = jnp.where(valid[:, :, None], slabs, 0)
    qx = jnp.transpose(slabs[:, :, :16], (1, 2, 0))
    qy = jnp.transpose(slabs[:, :, 16:], (1, 2, 0))
    return qx, qy


@functools.partial(jax.jit, static_argnums=(3, 4))
def _fused_group(pts32, ds_grp, order_grp, c: int, r_rows: int) -> JPoint:
    """Bucket sums for a GROUP of windows in ONE jitted program: per window,
    dense-grid gather + VMEM-resident Pallas accumulation
    (curve_pallas.bucket_accumulate). One launch per MSM group — unjitted
    per-op dispatch is ruinous through this environment's TPU relay
    (measured: the same math costs 20x more as individual dispatches).

    The window loop is a lax.scan, NOT an unrolled Python loop: each
    window's dense grid is an R * 2^c point slab (~150 MB at c=10/2^20) and
    XLA keeps unrolled iterations' temporaries alive concurrently — 18 GB of
    HBM at c=10 (measured OOM). The scan bounds live grid memory to one
    window.

    Narrow windows get U sub-accumulators per bucket (grid rows r fold
    into kernel row r//U, lane slot (r%U)*nbc + b) to fill the 4096 kernel
    lanes; at full width (nb = 4096) a round-5 probe measured chain
    splitting (s calls x u chains at constant lanes) to be perf-neutral —
    the kernel is throughput-bound, not add-chain-latency-bound — so wide
    windows run as ONE call (fewest launches/compiles). Lanes are capped
    at 4096: 8192 runs ~2.3x slower per step (VMEM pressure), 16k OOMs."""
    from . import curve_pallas as CP

    nb = 1 << c
    # lanes = u*nb/s must be a multiple of 128 (Mosaic tiling) and <= 4096
    u = max(1, min(_LANES // nb, max(_UNROLL, 128 // nb)))
    s = max(1, (nb * u) // _LANES)     # bucket-range splits per window
    nbc = nb // s
    r_eff = ((r_rows + u - 1) // u) * u

    def body(_, row):
        ds_w, order_w = row
        qx, qy = _dense_grid_sorted(pts32, ds_w, order_w, c, r_eff)
        parts = []
        for si in range(s):
            gx = qx[:, :, si * nbc:(si + 1) * nbc]
            gy = qy[:, :, si * nbc:(si + 1) * nbc]
            # [R, 16, nbc] -> [R/u, 16, u*nbc]: sub-accumulator lanes
            gx = gx.reshape(r_eff // u, u, 16, nbc).transpose(0, 2, 1, 3)
            gy = gy.reshape(r_eff // u, u, 16, nbc).transpose(0, 2, 1, 3)
            gx = gx.reshape(r_eff // u, 16, u * nbc)
            gy = gy.reshape(r_eff // u, 16, u * nbc)
            ox, oy, oz = CP.bucket_accumulate(gx, gy, u * nbc)
            sub = JPoint(ox.T.reshape(u, nbc, -1), oy.T.reshape(u, nbc, -1),
                         oz.T.reshape(u, nbc, -1))
            while sub.x.shape[0] > 1:
                half = sub.x.shape[0] // 2
                a = jax.tree.map(lambda t: t[:half], sub)
                b = jax.tree.map(lambda t: t[half:], sub)
                sub = CP.add_incomplete(a, b)
            parts.append(sub)
        bx = jnp.concatenate([p.x[0] for p in parts], axis=0)
        by = jnp.concatenate([p.y[0] for p in parts], axis=0)
        bz = jnp.concatenate([p.z[0] for p in parts], axis=0)
        return 0, (bx, by, bz)

    _, (bx, by, bz) = jax.lax.scan(body, 0, (ds_grp, order_grp))
    return JPoint(bx, by, bz)  # [g, nb]


@functools.partial(jax.jit, static_argnums=1)
def _fold_axis0(cur: JPoint, k: int) -> JPoint:
    """Tree-sum a JPoint batch [k, w] down to [1, w] at a FIXED shape.

    A Python while-halving loop compiles a fresh Pallas add kernel for every
    level's shape (log2(k) multi-second Mosaic compiles at c=12 — the r3
    compile blowup); here every level is one C.add at the same [k, w] shape
    with masked partners, so the whole fold is ONE compiled program. The
    k*log(k) lane work is noise next to the grid accumulation."""
    k_eff = cur.x.shape[0]
    assert k_eff == k
    if k == 1:
        return cur
    w = cur.x.shape[1]
    inf = C.infinity((k, w))
    pos = jnp.arange(k, dtype=jnp.int32)[:, None]

    def level(l, t):
        half = jnp.int32(k) >> (l + 1)
        idx = jnp.broadcast_to(jnp.clip(pos + half, 0, k - 1), (k, w))
        valid = jnp.broadcast_to(pos < half, (k, w))
        partner = JPoint(
            jnp.take_along_axis(t.x, idx[..., None], axis=0),
            jnp.take_along_axis(t.y, idx[..., None], axis=0),
            jnp.take_along_axis(t.z, idx[..., None], axis=0),
        )
        partner = jax.tree.map(
            lambda p, i: F._select(valid, p, i), partner, inf
        )
        return CP.add_incomplete(t, partner)

    out = jax.lax.fori_loop(0, k.bit_length() - 1, level, cur)
    return JPoint(out.x[:1], out.y[:1], out.z[:1])


def _top_regroup(digits, c: int):
    """Fold the top window's group index into its digits (see
    _window_sums_fused): group g's digit d maps to bucket g*nb_top + d.
    Returns (dig2, kb, k_split, nb_top); dig2 is None when k_split == 1.
    Factored out so batched callers can prefetch dig2's occupancy in the
    same host round as the per-window occupancies."""
    nw = digits.shape[0]
    top_bits = max(1, SCALAR_BITS - (nw - 1) * c)
    nb = 1 << c
    n_pts = digits.shape[1]
    k_split = max(1, min(nb >> top_bits, n_pts & (-n_pts)))
    nb_top = 1 << top_bits
    if k_split == 1:
        return None, 0, 1, nb_top
    group = jnp.arange(n_pts, dtype=jnp.uint32) // jnp.uint32(
        n_pts // k_split)
    dtop = digits[nw - 1]
    dig2 = jnp.where(dtop == 0, 0, dtop + group * jnp.uint32(nb_top))
    kb = (k_split * nb_top).bit_length() - 1
    return dig2, kb, k_split, nb_top


def _quant(r):
    """Round a grid depth up to 3 significant bits: bounds the number of
    distinct compiled shapes (static r_rows) at <= 12.5% extra rows (grid
    rows are the sequential step count of the bucket kernel, so padding
    slack is directly wall time; the persistent compile cache absorbs the
    2x larger variant set)."""
    if r <= 8:
        return 8
    step = 1 << max(r.bit_length() - 4, 0)
    return ((r + step - 1) // step) * step


def _window_sums_fused(points: APoint, plan: dict, occs) -> JPoint:
    """All-window bucket sums with occupancy-grouped grids over PRE-sorted
    digit rows (plan['ds']/plan['order'] from _plan_sort; row nw-1 is the
    top window — regrouped when k_split > 1).

    The top window's digits span far fewer than c bits (254 = 8*31+6 for
    Fr), so its occupancy is ~4x the others — giving it its own grid depth
    keeps total work near the ideal nw*N adds instead of nw*R_max*nb.
    ``occs``: host list of per-row max occupancies.
    """
    c = plan["c"]
    nw = _n_windows(c)
    ds, order = plan["ds"], plan["order"]
    kb, k_split, nb_top = plan["kb"], plan["k_split"], plan["nb_top"]

    r_low_raw = max(max(occs[: nw - 1]), 1)
    pts32 = jnp.concatenate([points.x, points.y], axis=-1)  # 128 B rows
    # The TOP window spans only the leftover scalar bits: its digits fit in
    # 2^top_bits buckets but its occupancy is 2^(c-top_bits) times higher —
    # a full-width dense grid for it would be R_top * 2^c points (6 GB at
    # c=10/2^20, measured OOM). Instead split its points into K groups
    # (K = 2^(c-top_bits)): each group accumulates into its own 2^top_bits
    # buckets — restoring both the grid volume (~N slots total) and the
    # kernel's lane utilization — and a fixed-shape fold merges the groups.
    nb = 1 << c
    if k_split == 1:
        r_low = _quant(r_low_raw)
        low = _fused_group(pts32, ds[: nw - 1], order[: nw - 1], c, r_low)
        top = _fused_group(pts32, ds[nw - 1:], order[nw - 1:], c,
                           _quant(max(occs[nw - 1], 1)))
    else:
        # the top window's points are spread across k groups by folding the
        # group index into the digit (digit 0 stays at global bucket 0,
        # which the grid skips — see _top_regroup). This reuses the
        # full-width kernel AT THE LOW WINDOWS' SHAPE — same compiled
        # program, full lane utilization, ~N grid slots — then _fold_axis0
        # (one compiled program) folds the k group ranges.
        occ2 = occs[-1]
        if kb == c:
            # one shared (c, r) shape for the low AND top grids: halves the
            # number of multi-minute _fused_group compiles (r3 weak #2a)
            r_low = _quant(max(r_low_raw, occ2))
            r_top = r_low
        else:
            r_low = _quant(r_low_raw)
            r_top = _quant(max(occ2, 1))
        low = _fused_group(pts32, ds[: nw - 1], order[: nw - 1], c, r_low)
        comb = _fused_group(pts32, ds[nw - 1:], order[nw - 1:], kb, r_top)
        cur = JPoint(comb.x.reshape(k_split, nb_top, -1),
                     comb.y.reshape(k_split, nb_top, -1),
                     comb.z.reshape(k_split, nb_top, -1))
        top = _fold_axis0(cur, k_split)                 # [1, nb_top]
    pad = nb - top.x.shape[1]
    if pad:
        top = JPoint(
            jnp.pad(top.x, ((0, 0), (0, pad), (0, 0))),
            jnp.pad(top.y, ((0, 0), (0, pad), (0, 0))),
            jnp.pad(top.z, ((0, 0), (0, pad), (0, 0))),
        )
    buckets = JPoint(
        jnp.concatenate([low.x, top.x]),
        jnp.concatenate([low.y, top.y]),
        jnp.concatenate([low.z, top.z]),
    )
    return _weighted_sum_jit(buckets, c)


@functools.partial(jax.jit, static_argnums=1)
def _weighted_sum_jit(buckets: JPoint, c: int) -> JPoint:
    return _weighted_bucket_sum(buckets, c)


def _suffix_weighted(t, bits: int, nw: int, nb: int) -> JPoint:
    """sum_b b * t_b over [nw, nb] buckets via double suffix scan.

    Fold 1 (over raw bucket sums) may use the INCOMPLETE add: each pair
    adds sums of disjoint bucket subsets, whose collision is a DLOG
    relation. Fold 2 (over the suffix-cumulative values) MUST use the
    complete add: whenever a run of buckets is empty the suffix value is
    CONSTANT across the run, so a pair routinely adds two EQUAL group
    elements — exactly the doubling case the incomplete formulas drop
    (found the hard way in round 4: every spartan commit with an empty
    bucket produced a wrong weighted sum; random 2^12 scalars fill all
    256 buckets, which is why spot checks passed)."""

    def _suffix_fold(t, complete: bool):
        inf = C.infinity((nw, nb))
        pos = jnp.arange(nb, dtype=jnp.int32)[None, :]

        def level(l, t):
            s = jnp.left_shift(jnp.int32(1), l)
            idx = jnp.broadcast_to(jnp.clip(pos + s, 0, nb - 1), (nw, nb))
            valid = jnp.broadcast_to(pos + s < nb, (nw, nb))
            partner = JPoint(
                jnp.take_along_axis(t.x, idx[..., None], axis=1),
                jnp.take_along_axis(t.y, idx[..., None], axis=1),
                jnp.take_along_axis(t.z, idx[..., None], axis=1),
            )
            partner = jax.tree.map(
                lambda a, b: F._select(valid, a, b), partner, inf
            )
            return C.add(t, partner) if complete \
                else CP.add_incomplete(t, partner)

        return jax.lax.fori_loop(0, bits, level, t)

    t = _suffix_fold(t, complete=False)
    t = jax.tree.map(
        lambda a, b: a.at[:, 0].set(b[:, 0]), t, C.infinity((nw, nb))
    )
    total = _suffix_fold(t, complete=True)
    return JPoint(total.x[:, 0], total.y[:, 0], total.z[:, 0])


def _axis_reduce(t: JPoint, axis: int) -> JPoint:
    """Tree-sum a JPoint array along ``axis`` with INCOMPLETE adds (each
    pair combines sums over disjoint bucket subsets — the fold-1 DLOG
    argument; infinity inputs are exact)."""
    while t.x.shape[axis] > 1:
        half = t.x.shape[axis] // 2
        a = jax.tree.map(lambda v: jax.lax.slice_in_dim(v, 0, half, axis=axis), t)
        b = jax.tree.map(
            lambda v: jax.lax.slice_in_dim(v, half, 2 * half, axis=axis), t)
        t = CP.add_incomplete(a, b)
    return t


def _weighted_bucket_sum(buckets: JPoint, c: int) -> JPoint:
    """sum_b b * S_b per window, digit-SPLIT: with b = hi * 2^l + lo,

        sum_b b*S_b = 2^l * sum_hi hi * (sum_lo S) + sum_lo lo * (sum_hi S),

    so the two suffix scans run at widths 2^h and 2^l instead of 2^c —
    the marginal reductions are log-depth trees of full-width incomplete
    adds (HALVING width per level, ~2*2^c total lane work, vs the flat
    2c*2^c of a full-width double-suffix scan). This keeps the weighted
    stage cheap as c grows."""
    nw, nb = buckets.x.shape[0], buckets.x.shape[1]
    if nb <= 16:
        return _suffix_weighted(buckets, c, nw, nb)
    lbits = c // 2
    hbits = c - lbits
    grid = jax.tree.map(
        lambda v: v.reshape(nw, 1 << hbits, 1 << lbits, F.NLIMBS), buckets)
    s_hi = _axis_reduce(grid, axis=2)        # [nw, 2^h, 1]
    s_hi = jax.tree.map(lambda v: v[:, :, 0], s_hi)
    s_lo = _axis_reduce(grid, axis=1)        # [nw, 1, 2^l]
    s_lo = jax.tree.map(lambda v: v[:, 0], s_lo)
    w_hi = _suffix_weighted(s_hi, hbits, nw, 1 << hbits)   # [nw]
    w_lo = _suffix_weighted(s_lo, lbits, nw, 1 << lbits)   # [nw]
    for _ in range(lbits):
        w_hi = C.double(w_hi)
    return C.add(w_hi, w_lo)


@functools.partial(jax.jit, static_argnums=1)
def _occupancies(digits, c: int):
    """Per-window max bucket count (bucket 0 excluded)."""
    nb = 1 << c
    counts = jax.vmap(
        lambda row: jnp.zeros((nb,), jnp.int32).at[row].add(1)
    )(digits)
    counts = counts.at[:, 0].set(0)
    return jnp.max(counts, axis=1)


def _max_occupancy(digits, c: int) -> int:
    return int(jax.device_get(jnp.max(_occupancies(digits, c))))


@functools.partial(jax.jit, static_argnums=(1, 2))
def _horner_windows(sums: JPoint, c: int, nw: int) -> JPoint:
    """Combine per-window sums: acc = sum_w 2^(c*w) * S_w, Horner order —
    ONE jitted program, but compile-bounded: a lax.scan over windows whose
    body is c doublings + 1 add (doubling infinity stays at infinity, so no
    first-iteration special case). One launch instead of ~nw*(c+1) per-op
    dispatches (ruinous through the TPU relay), with an HLO ~nw x smaller
    than inlining the whole ladder."""

    def body(acc, s):
        for _ in range(c):
            acc = C.double(acc)
        acc = C.add(acc, JPoint(s.x[None], s.y[None], s.z[None]))
        return acc, None

    rev = JPoint(jnp.flip(sums.x, 0), jnp.flip(sums.y, 0),
                 jnp.flip(sums.z, 0))
    acc, _ = jax.lax.scan(body, C.infinity((1,)), rev)
    return acc


def _horner_host(sums: JPoint, c: int) -> JPoint:
    """Window combine on the HOST: acc = sum_w 2^(c*w) * S_w.

    The device ladder (`_horner_windows`) is ~nw*(c+1) batch-1 curve ops —
    pure per-op overhead on a vector machine (measured 549 ms of a 790 ms
    2^16 MSM, 70% of total). The window sums are only nw points (~3 KB):
    fetch them, run the 254-double Horner on Python bigints (~10 ms), and
    re-upload one point. Exact same group element; affine coords identical."""
    aff = C.points_to_ints(C.to_affine(sums))  # [(x, y)] ints, (0,0) = inf
    xy = _horner_affine_ints(aff, c)
    if xy == (0, 0):
        return C.infinity((1,))
    return C.from_affine(C.points_from_ints([xy]))


def _horner_affine_ints(aff, c: int) -> tuple:
    """Host-bigint Horner over per-window affine sums ``aff`` (list of
    (x, y) int pairs, low window first, (0, 0) = infinity). Returns the
    combined point's (x, y) ints, (0, 0) for infinity."""
    p = F.FQ_MODULUS

    def dbl(pt):
        if pt is None:
            return None
        x, y = pt
        if y == 0:
            return None
        m = 3 * x * x * pow(2 * y, -1, p) % p
        nx = (m * m - 2 * x) % p
        return (nx, (m * (x - nx) - y) % p)

    def add(p1, p2):
        if p1 is None:
            return p2
        if p2 is None:
            return p1
        (x1, y1), (x2, y2) = p1, p2
        if x1 == x2:
            return dbl(p1) if y1 == y2 else None
        m = (y2 - y1) * pow(x2 - x1, -1, p) % p
        nx = (m * m - x1 - x2) % p
        return (nx, (m * (x1 - nx) - y1) % p)

    acc = None
    for xy in reversed(aff):
        for _ in range(c):
            acc = dbl(acc)
        acc = add(acc, None if xy == (0, 0) else xy)
    return (0, 0) if acc is None else acc


@jax.jit
def _small_value_stats(std_limbs):
    """(all scalars < 2^16?, #distinct values) for the counter-poly gate."""
    small = jnp.all(std_limbs[:, 1:] == 0)
    v = jnp.sort(std_limbs[:, 0])
    distinct = 1 + jnp.sum(v[1:] != v[:-1])
    return small, distinct


@functools.partial(jax.jit, static_argnums=2)
def _group_by_value(pts32, std_lo, u_bound: int):
    """Sum points per distinct (small) scalar value: sorted segmented
    suffix-sum in log2(N) full-width incomplete adds.

    Counter polynomials (Lasso read/final counts — the bulk of a Jolt
    prover's commits) have thousands of points per scalar VALUE; Pippenger
    bucket occupancy equals that multiplicity, so both the dense-grid and
    the while-loop paths degrade to multiplicity-many sequential steps.
    Grouping first costs ~log2(N) batched adds regardless of skew, and the
    remaining MSM has u_bound distinct scalars with multiplicity 1.

    Returns (group sums JPoint [u_bound], group scalar values [u_bound]
    u32, valid mask); invalid slots are infinity with value 0. Incomplete
    adds are safe: every partner accumulates a disjoint run of distinct
    input points (see curve_pallas._add_incomplete_kernel).
    """
    n = std_lo.shape[0]
    order = jnp.argsort(std_lo)
    vals = std_lo[order]
    sorted32 = jnp.take(pts32, order, axis=0)
    flags = jnp.concatenate(
        [jnp.ones((1,), bool), vals[1:] != vals[:-1]])
    segid = jnp.cumsum(flags)
    one = jnp.asarray(FQ.one_mont)
    px = sorted32[:, :16]
    py = sorted32[:, 16:]
    p_inf = jnp.all(jnp.concatenate([px, py], -1) == 0, axis=-1)
    pz = jnp.where(p_inf[:, None], jnp.zeros((16,), jnp.uint32), one)
    cur = JPoint(px, py, pz)
    inf = C.infinity((n,))
    pos = jnp.arange(n, dtype=jnp.int32)

    def level(l, t):
        s = jnp.left_shift(jnp.int32(1), l)
        idx = jnp.clip(pos + s, 0, n - 1)
        valid = jnp.logical_and(pos + s < n, segid[idx] == segid)
        partner = JPoint(t.x[idx], t.y[idx], t.z[idx])
        partner = jax.tree.map(
            lambda a, b: F._select(valid, a, b), partner, inf)
        return CP.add_incomplete(t, partner)

    acc = jax.lax.fori_loop(0, max((n - 1).bit_length(), 1), level, cur)
    heads = jnp.nonzero(flags, size=u_bound, fill_value=n)[0]
    ok = heads < n
    hidx = jnp.clip(heads, 0, n - 1)
    gsum = JPoint(acc.x[hidx], acc.y[hidx], acc.z[hidx])
    gsum = jax.tree.map(
        lambda a, b: F._select(ok, a, b), gsum, C.infinity((u_bound,)))
    gval = jnp.where(ok, vals[hidx], 0)
    return gsum, gval, ok


def _by_value_sums(points: APoint, std_lo, u_bound: int):
    """Window sums for small-valued scalars: per-value grouping (log2 N
    batched incomplete adds), then a u_bound-point follow-up MSM down the
    while-loop path. After grouping every scalar value is distinct, so the
    while-loop's step count (max bucket occupancy) is ~u_bound/2^c — and,
    unlike a recursive msm() call, no further host gating round is needed
    (msm_batch_ints promises two fetch rounds per chunk)."""
    pts32 = jnp.concatenate([points.x, points.y], axis=-1)
    gsum, gval, _ = _group_by_value(pts32, std_lo, u_bound)
    aff = C.to_affine(gsum)               # infinity -> (0, 0), zero scalar
    limbs = jnp.zeros((u_bound, F.NLIMBS), jnp.uint32)
    limbs = limbs.at[:, 0].set(gval & 0xFFFF)
    limbs = limbs.at[:, 1].set(gval >> 16)
    c2 = _auto_c(u_bound)
    digits2 = window_digits(F.to_mont(FR, limbs), c2)
    return _all_window_sums(aff, digits2, c2), c2


def _auto_c(n: int) -> int:
    """Window size balancing lane volume vs sequential steps.

    The batched-bucket cost model is nw*nb*(occupancy + 2c) lane point-adds
    (occupancy ~ n/nb): small MSMs must shrink the bucket grid or a 16-point
    commit pays the full [nw, 2^c] machinery (measured 8 s/commit on CPU at
    c=8 — the round-2 test-suite wall). TPU keeps larger windows: the fused
    VMEM kernel amortizes bucket state and wins from fewer windows.
    """
    log2n = max(n.bit_length() - 1, 1)
    if jax.default_backend() == "tpu":
        return min(12, max(8, log2n - 8))
    return max(2, min(8, log2n // 2))


def _plan_msm(points: APoint, scalars_mont, c: int | None) -> dict:
    """Phase 1 of a (batched) MSM: dispatch the window digits and the
    small-value stats (by-value path gate) WITHOUT blocking. The caller
    fetches all plans' ``fetch`` pytrees in ONE device_get round, then
    calls _plan_sort."""
    n = points.x.shape[0]
    if c is None:
        c = _auto_c(n)
    on_tpu = jax.default_backend() == "tpu"
    plan = {"points": points, "c": c, "n": n, "fetch": {}}
    if on_tpu and n >= (1 << 13):
        # counter-poly fast path gate: thousands of points per distinct
        # value make bucket occupancy (= sequential steps) explode on both
        # Pippenger paths; group by value first (log2 N batched adds)
        std = F.from_mont(FR, scalars_mont)
        plan["std_lo"] = std[:, 0]
        plan["fetch"]["svs"] = _small_value_stats(std)
    plan["digits"] = window_digits(scalars_mont, c)
    return plan


def _plan_sort(plan: dict, got1: dict) -> dict:
    """Phase 2: with the by-value gate resolved, dispatch the batched digit
    sort + occupancy sweep for the fused path (skipped entirely for
    by-value/small jobs, so counter-poly commits never pay for a sort).
    Returns the phase-2 fetch dict (one more non-blocking device round)."""
    n, c = plan["n"], plan["c"]
    if "svs" in got1:
        small, distinct = got1["svs"]
        u_bound = min(n // 8, 1 << 12)
        if bool(small) and int(distinct) <= u_bound:
            plan["path"] = "byvalue"
            plan["u_bound"] = u_bound
            return {}
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu and n >= (1 << (c + 2))):
        plan["path"] = "loop"
        return {}
    digits = plan["digits"]
    nw = _n_windows(c)
    dig2, kb, k_split, nb_top = _top_regroup(digits, c)
    top_row = digits[nw - 1] if k_split == 1 else dig2
    rows = jnp.concatenate([digits[: nw - 1], top_row[None]], axis=0)
    ds, order = _sort_rows(rows)
    plan.update(ds=ds, order=order, kb=kb, k_split=k_split, nb_top=nb_top)
    plan["path"] = "fused"
    # kb <= c always, so a c-bit id sweep covers the regrouped top row too
    return {"occs": _occs_from_sorted(ds, c)}


def _sums_from_plan(plan: dict, got2: dict):
    """Phase 3: dispatch the window-sum computation down the chosen path.
    Returns (sums JPoint [nw], effective window bits) — still fully
    on-device, no blocking."""
    points = plan["points"]
    c, n = plan["c"], plan["n"]
    nw = _n_windows(c)
    path = plan.get("path")
    if path == "byvalue":
        return _by_value_sums(points, plan["std_lo"], plan["u_bound"])
    if path == "fused" and "occs" in got2:
        occs = [int(v) for v in got2["occs"]]
        # dense-grid memory is R*nb points per window; cap the waste
        if max(occs[: nw - 1]) <= max(4, (4 * n) // (1 << c)):
            return _window_sums_fused(points, plan, occs), c
    return _all_window_sums(points, plan["digits"], c), c


def msm(points: APoint, scalars_mont, c: int | None = None) -> JPoint:
    """Variable-base MSM: sum_i scalars[i] * points[i]. Returns batch-1 JPoint.

    ``points``: affine batch [N]; ``scalars_mont``: Fr Montgomery [N, 16].
    ``c``: Pippenger window bits (None = size to N via _auto_c; the result
    is identical for any c). On TPU, near-uniform digit distributions take
    the fused bucket kernel (buckets resident in VMEM, points streamed once
    per window, occupancy-grouped grid depths, digits pre-sorted for all
    windows in one batched lax.sort); pathologically skewed ones
    (e.g. counter polynomials, where one bucket swallows most points) take
    per-value grouping or the batched while-loop whose step count is max
    occupancy. Many independent MSMs should go through msm_batch_ints,
    which amortizes the host gating rounds across the whole batch.
    """
    plan = _plan_msm(points, scalars_mont, c)
    got1 = jax.device_get(plan["fetch"])
    fetch2 = _plan_sort(plan, got1)
    got2 = jax.device_get(fetch2)
    sums, c_eff = _sums_from_plan(plan, got2)
    return _horner_host(sums, c_eff)


def _batch_chunks(jobs, chunk: int, budget_elems: int = 1 << 26):
    """Split ``jobs`` into runs of <= ``chunk`` jobs whose summed digit
    buffers (nw * N u32 per job) stay under ``budget_elems`` (~256 MB of
    u32): a fixed 64-job chunk of 2^20-point jobs would otherwise keep
    several GB of speculative digit/occupancy state live at once."""
    runs, cur, cur_elems = [], [], 0
    for job in jobs:
        n = job[0].x.shape[0]
        est = _n_windows(_auto_c(n)) * n
        if cur and (len(cur) >= chunk or cur_elems + est > budget_elems):
            runs.append(cur)
            cur, cur_elems = [], 0
        cur.append(job)
        cur_elems += est
    if cur:
        runs.append(cur)
    return runs


def msm_batch_ints(jobs, chunk: int = 64) -> list:
    """Many independent MSMs, finished on the host: ``jobs`` is a list of
    (APoint batch, Fr-Montgomery scalars [N, 16]) pairs; returns one
    affine (x, y) int pair per job ((0, 0) = infinity).

    The whole batch costs THREE blocking fetch rounds per ``chunk`` jobs —
    path-gating stats, occupancies (only for jobs taking the fused path),
    then one fetch of all window sums concatenated through a single
    batched to_affine — instead of msm()'s round-trips per call. Through
    the TPU relay that difference was 82% of the Jolt prover's
    commit-phase wall (222 per-commit MSMs x ~0.4 s of host round-trips;
    README 'Performance'). The group math is identical to per-call msm();
    only the fetch schedule differs. ``chunk`` bounds live digit-buffer
    memory (nw*N u32 per job), and a byte budget further shrinks runs
    containing large jobs (_batch_chunks).

    Maps the reference's batch_msm (co-spartan/src/worker.rs:801-804,
    co-jolt's batch-committed polynomials) — there a rayon loop over CPU
    cores, here a dispatch-then-fetch schedule over one accelerator.
    """
    out = []
    for batch in _batch_chunks(jobs, chunk):
        plans = [_plan_msm(p, s, None) for p, s in batch]
        got1_all = jax.device_get([pl["fetch"] for pl in plans])
        fetch2 = [_plan_sort(pl, g1) for pl, g1 in zip(plans, got1_all)]
        got2_all = jax.device_get(fetch2)
        sums, eff = [], []
        for pl, got in zip(plans, got2_all):
            s_i, c_i = _sums_from_plan(pl, got)
            sums.append(s_i)
            eff.append(c_i)
        cat = JPoint(jnp.concatenate([s.x for s in sums]),
                     jnp.concatenate([s.y for s in sums]),
                     jnp.concatenate([s.z for s in sums]))
        aff = C.points_to_ints(C.to_affine(cat))
        off = 0
        for s_i, c_i in zip(sums, eff):
            nwi = s_i.x.shape[0]
            out.append(_horner_affine_ints(aff[off:off + nwi], c_i))
            off += nwi
    return out


# --- fixed-base MSM (SRS generation: one base, many scalars) ---------------


@functools.partial(jax.jit, static_argnums=1)
def _fixed_base_table(base: APoint, c: int) -> APoint:
    """Precompute T[w, d] = d * 2^(c*w) * base, affine, shape [nw, 2^c]."""
    nb = 1 << c
    nw = _n_windows(c)

    # row 0: 0, g, 2g, ... via scan of batch-1 mixed adds
    def step(acc, _):
        nxt = C.add_mixed(acc, APoint(base.x[None], base.y[None]))
        return nxt, acc

    init = C.infinity((1,))
    _, row0 = jax.lax.scan(step, init, None, length=nb)
    row0 = JPoint(row0.x[:, 0], row0.y[:, 0], row0.z[:, 0])  # [nb]

    def next_row(cur, _):
        for _ in range(c):
            cur = C.double(cur)
        return cur, cur

    _, rows_rest = jax.lax.scan(next_row, row0, None, length=nw - 1)
    table = JPoint(
        jnp.concatenate([row0.x[None], rows_rest.x]),
        jnp.concatenate([row0.y[None], rows_rest.y]),
        jnp.concatenate([row0.z[None], rows_rest.z]),
    )
    flat = JPoint(
        table.x.reshape(-1, F.NLIMBS),
        table.y.reshape(-1, F.NLIMBS),
        table.z.reshape(-1, F.NLIMBS),
    )
    aff = C.to_affine(flat)
    return APoint(
        aff.x.reshape(nw, nb, F.NLIMBS), aff.y.reshape(nw, nb, F.NLIMBS)
    )


@functools.partial(jax.jit, static_argnums=2)
def _fixed_base_apply(table: APoint, digits, c: int) -> JPoint:
    """acc_i = sum_w T[w, digit_{w,i}] — nw batched mixed adds of width N."""
    n = digits.shape[1]

    def step(acc, x):
        dig, tx, ty = x
        q = APoint(tx[dig], ty[dig])
        return C.add_mixed(acc, q), None

    acc, _ = jax.lax.scan(step, C.infinity((n,)), (digits, table.x, table.y))
    return acc


def fixed_base_msm(base: APoint, scalars_mont, c: int = 8) -> JPoint:
    """base * s_i for a batch of scalars; returns Jacobian batch [N]."""
    table = _fixed_base_table(base, c)
    digits = window_digits(scalars_mont, c)
    return _fixed_base_apply(table, digits, c)
