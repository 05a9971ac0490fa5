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
from .curve import APoint, JPoint

SCALAR_BITS = 254


def _n_windows(c: int) -> int:
    return (SCALAR_BITS + c - 1) // c


@functools.partial(jax.jit, static_argnums=1)
def window_digits(scalars_mont, c: int):
    """Montgomery-form Fr scalars [N, 16] -> window digits [n_windows, N] u32.

    c must divide 16 (digits never straddle limb boundaries).
    """
    assert 16 % c == 0, "window size must divide 16"
    std = F.from_mont(FR, scalars_mont)  # [N, 16] standard-form digits
    per_limb = 16 // c
    mask = jnp.uint32((1 << c) - 1)
    outs = []
    for w in range(_n_windows(c)):
        limb = std[..., w // per_limb]
        sh = jnp.uint32(c * (w % per_limb))
        outs.append((limb >> sh) & mask)
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


def msm(points: APoint, scalars_mont, c: int = 8) -> JPoint:
    """Variable-base MSM: sum_i scalars[i] * points[i]. Returns batch-1 JPoint.

    ``points``: affine batch [N]; ``scalars_mont``: Fr Montgomery [N, 16].
    """
    nw = _n_windows(c)
    digits = window_digits(scalars_mont, c)
    sums = _all_window_sums(points, digits, c)  # JPoint [nw]
    acc = C.infinity((1,))
    for w in reversed(range(nw)):
        if w != nw - 1:
            for _ in range(c):
                acc = C.double(acc)
        acc = C.add(acc, JPoint(sums.x[w : w + 1], sums.y[w : w + 1],
                                sums.z[w : w + 1]))
    return acc


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
