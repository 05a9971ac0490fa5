"""Generic sumcheck engine over MLE evaluation tables (public or Rep3-shared).

Prover rounds (maps ark-linear-sumcheck's IPForMLSumcheck and the reference's
specialized Rep3 folds — co-spartan/src/sumcheck.rs:171-395, co-jolt
subprotocols/sumcheck.rs):

  round j over tables of 2h entries: for each table p, its restriction to
  x_0 = t is the vector p_t = even + t*(odd - even); the round message is
  s_j(t) = sum_half comb(p_t) for t = 0..degree — (degree+1) evaluations.
  Fiat-Shamir absorbs the evaluations, squeezes r_j, and every table binds
  x_0 <- r_j (reusing the slopes).

Conventions:
- element axis is ALWAYS axis -2 (tables are [..., n, 16]); a Rep3-shared
  table carries its party axis in the leading dims ([3, n, 16]) and the
  engine opens round evaluations by summing over axis 0 (+ zero-share masks
  from correlated rng) before they touch the transcript — the MPC and
  plaintext sumchecks share this one implementation.
- ``comb`` receives the per-table restrictions and must return either a
  public [..., h, 16] array or an additive-share stack [3, h, 16]; for
  share*share products the caller uses the Rep3 3-term formula (mpc.mul).

The host verifier (``verify``) interpolates each round polynomial from its
evaluations and walks the same transcript — used by models/*/verifier.py.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from . import field as F
from . import transcript as T
from .field import FR, FieldSpec

_round_fn_cache = {}

# below this element count, rounds run at a FIXED padded shape (bound tables
# are zero-padded back up), so XLA compiles ONE kernel per comb instead of
# one per table size. Requires comb(all-zero restrictions) == 0, which holds
# for every comb in this framework (each has a zero-padded eq/public factor).
FIXED_CUTOFF = 1 << 8

# rounds above the cutoff run as a fori_loop over fixed-size element chunks
# of padded full-size buffers, with the active length a TRACED scalar: one
# compiled program covers every large round of a sumcheck instance (the
# compile-boundedness fix — round-2 cold compiles of the shared collation
# comb took ~45 min because every table size recompiled the comb graph).
#
# Chunk sizing: each fori iteration issues ~30 small kernel launches; at
# 2^12 a 2^20-element prove makes ~15k of them and the TPU spends ~0.6 s
# in launch latency alone (measured r4: 1.8 M elems/s ~ 0.1% of roofline).
# 2^16 on TPU cuts the iteration count 16x with the same compiled-program
# count; the chunk split point does not change any prover message (modular
# addition is exactly associative). CPU keeps 2^12 (compile size).
import os as _os

CHUNK = int(_os.environ.get("COZK_SC_CHUNK", "0")) or (
    1 << 16 if jax.default_backend() == "tpu" else 1 << 12)

# fused Pallas round path (sumcheck_pallas.py): "auto" = on TPU,
# "force" = everywhere (CPU interpret — tests), "off" = never.
# DEFAULT OFF: the kernels are bit-correct but currently run at
# ~0.25 ms per grid step of fixed overhead on the v5e relay (measured
# r5: 246 ms for a 2^20 prove vs 217 ms on the XLA chunked engine), so
# the fused path does not yet beat the engine it replaces. Kept as a
# gated experimental path with kernel-level and full-prove equality
# tests; flip COZK_SC_LV=auto to re-enable on TPU.
LV_MODE = _os.environ.get("COZK_SC_LV", "off")


def _elem_slice(p, sl):
    return p[..., sl, :]


def _pad_elems(p, target):
    h = p.shape[-2]
    if h == target:
        return p
    pad = [(0, 0)] * p.ndim
    pad[-2] = (0, target - h)
    return jnp.pad(p, pad)


def eq_suffix_tables(spec, taus):
    """Dao-Thaler split-eq precompute (maps co-jolt
    poly/dense_interleaved_poly.rs:210-273 / split_eq_poly.rs): suffix
    tables S_j[y] = eq(taus[j+1:], y) for every round j, sizes
    2^(nv-1-j) .. 1, built LSB-first by ONE doubling sweep (the
    intermediates of the eq-table build ARE the suffix tables).

    With these, round j's message is

        g_j(t) = c_j * eq(tau_j, t) * sum_y S_j[y] * comb(tables_t[y]),
        c_{j+1} = c_j * eq(tau_j, r_j),   c_0 = 1,

    so the eq factor is never STREAMED nor BOUND: a degree-3 outer round
    drops from 4 table streams + 4 binds to 3 + 3 with a half-size
    read-only suffix — identical round messages, same proofs.
    Returns (suffix list [nv], full eq table)."""
    nv = taus.shape[0]
    one = F.ones_mont(spec)
    t = one[None]                            # [1, 16]
    suf = [None] * nv
    for j in range(nv - 1, -1, -1):
        suf[j] = t
        w = taus[j]
        t1 = F.mul(spec, t, jnp.broadcast_to(w, t.shape))
        t0 = F.sub(spec, t, t1)              # (1-w) * t
        t = jnp.stack([t0, t1], axis=1).reshape(-1, F.NLIMBS)
    return suf, t


def eq_suffix_tables_rev(spec, taus):
    """Dao-Thaler suffix tables in BIT-REVERSED order: Y_j[q] =
    S_j[rev(q)] — built directly by concatenating halves (MSB-first
    doubling) instead of interleaving (LSB-first), so no gather is ever
    needed. Feeds the fused Pallas rounds, whose buffers live in
    bit-reversed layout (sumcheck_pallas module docstring)."""
    nv = taus.shape[0]
    one = F.ones_mont(spec)
    t = one[None]
    suf = [None] * nv
    for j in range(nv - 1, -1, -1):
        suf[j] = t
        w = taus[j]
        t1 = F.mul(spec, t, jnp.broadcast_to(w, t.shape))
        t0 = F.sub(spec, t, t1)
        t = jnp.concatenate([t0, t1], axis=0)
    return suf


def _bitrev_rows(p, nvbits: int):
    """Bit-reversal permutation of the element axis, structured as two
    coarse gathers + one transpose: y[q] = p[rev(q)]. With q = ib*A + ia,
    rev(q) = rev_a(ia)*B + rev_b(ib), so y = ((p.reshape(A,B)[revA]).T)
    [revB] — each gather moves whole [B, 16] (resp. [A, 16]) rows, i.e.
    ~sqrt(n) DMA descriptors instead of n (a flat row gather of 2^20
    64-byte rows is descriptor-bound at ~24 ms)."""
    from . import ntt as _ntt

    a = nvbits // 2
    b = nvbits - a
    A, B = 1 << a, 1 << b
    revA = jnp.asarray(_ntt._bitrev_idx(a).astype("int32"))
    revB = jnp.asarray(_ntt._bitrev_idx(b).astype("int32"))
    u = p.reshape(A, B, F.NLIMBS)[revA]
    v = jnp.swapaxes(u, 0, 1)[revB]
    return v.reshape(p.shape)


def _eq_at_t(spec, w, degree: int):
    """[degree+1, 16]: eq(w, t) = (1-w) + t*(2w - 1) for t = 0..degree."""
    one = F.ones_mont(spec)
    step = F.sub(spec, F.add(spec, w, w), one)       # 2w - 1
    cur = F.sub(spec, one, w)
    out = [cur]
    for _ in range(degree):
        cur = F.add(spec, cur, step)
        out.append(cur)
    return jnp.stack(out)


def _t_stack(spec, even, slope, degree: int):
    """Restrictions at t = 0..degree stacked on a new axis -3.

    even/slope: [..., hh, 16] -> [..., degree+1, hh, 16]; entry t is
    even + t*slope (incremental adds, no scalar muls)."""
    levels = [even]
    cur = even
    for _ in range(degree):
        cur = F.add(spec, cur, slope)
        levels.append(cur)
    return jnp.stack(levels, axis=-3)


def _comb_batched(spec, degree: int, comb, curs, consts, chunk_i):
    """Evaluate ``comb`` at all degree+1 points in ONE vmapped call.

    ``curs``: per-table t-stacks [..., degree+1, hh, 16]. The comb sees its
    original rank (vmap maps axis -3), so every existing comb works
    unchanged; combs with ``wants_ctr`` additionally receive the (traced)
    chunk counter and their t-lane index for fresh in-chain reshare masks."""
    ts = jnp.arange(degree + 1, dtype=jnp.uint32)
    n = len(curs)
    if getattr(comb, "wants_ctr", False):
        fn = lambda cur, tt: comb(list(cur), consts, chunk_i, tt)
        return jax.vmap(fn, in_axes=((-3,) * n, 0), out_axes=-3)(
            tuple(curs), ts)
    if consts is None:
        fn = lambda cur: comb(list(cur))
    else:
        fn = lambda cur: comb(list(cur), consts)
    return jax.vmap(fn, in_axes=((-3,) * n,), out_axes=-3)(tuple(curs))


def _open_msg(spec, msg, mask, shared):
    """Apply the round-message zero-share mask and open the party axis."""
    if not shared:
        return msg
    if mask is not None:
        msg = F.add(spec, msg, mask)
    opened = msg[0]
    for p in range(1, msg.shape[0]):
        opened = F.add(spec, opened, msg[p])
    return opened  # [degree+1, 16]


def _zk_round(spec, degree, msg, zkarg):
    """Fold the ZK mask polynomial's round contribution into ``msg``.

    Maps ark-linear-sumcheck's mask_round (used by spartan/src/zk.rs): for
    g(x) = sum_var u_var(x_var), round j's message gains
    rho1 * (2^R * (A + u_j(t)) + 2^(R-1) * suffix_j), R = #remaining vars,
    A = sum_{k<j} u_k(r_k), suffix_j = sum_{k>j} (u_k(0)+u_k(1))."""
    rho1, u_ev, coeffs, suffix, pow_r, pow_r1, acc_a = zkarg
    gj = F.add(spec, u_ev, jnp.broadcast_to(acc_a, u_ev.shape))
    gj = F.mul(spec, jnp.broadcast_to(pow_r, gj.shape), gj)
    gj = F.add(spec, gj, jnp.broadcast_to(F.mul(spec, pow_r1, suffix),
                                          gj.shape))
    return F.add(spec, msg, F.mul(spec, jnp.broadcast_to(rho1, gj.shape), gj))


def _zk_accum(spec, degree, coeffs, r, acc_a):
    """A <- A + u_j(r) via Horner over the round's coefficient row."""
    u_r = coeffs[degree]
    for i in range(degree - 1, -1, -1):
        u_r = F.add(spec, F.mul(spec, u_r, r), coeffs[i])
    return F.add(spec, acc_a, u_r)


def _eq_r(spec, w, r):
    """eq(w, r) = (1-w) + r*(2w - 1)."""
    one = F.ones_mont(spec)
    step = F.sub(spec, F.add(spec, w, w), one)
    return F.add(spec, F.sub(spec, one, w), F.mul(spec, r, step))


def _scale_msg(spec, msg, wj, cfac, degree, shared):
    """Apply the split-eq round factor c_j * eq(tau_j, t) to the message."""
    fac = F.mul(spec, _eq_at_t(spec, wj, degree),
                jnp.broadcast_to(cfac, (degree + 1, F.NLIMBS)))
    if shared:
        fac = fac[None]
    return F.mul(spec, msg, jnp.broadcast_to(fac, msg.shape))


def _make_fixed_fn(spec: FieldSpec, degree: int, comb, shared: bool,
                   zk: bool = False, eqsplit: bool = False):
    """Small-round kernel: tables at the FIXED_CUTOFF padded shape; bound
    halves are zero-padded back up, so one program serves every small round
    (requires comb(all-zero restrictions) == 0)."""

    def round_fn(state, polys, mask=None, consts=None, zkarg=None,
                 eqarg=None):
        evens = [_elem_slice(p, slice(0, None, 2)) for p in polys]
        odds = [_elem_slice(p, slice(1, None, 2)) for p in polys]
        slopes = [F.sub(spec, o, e) for o, e in zip(odds, evens)]
        curs = [_t_stack(spec, e, s, degree) for e, s in zip(evens, slopes)]
        if eqsplit:
            suffix, wj, cfac = eqarg
            curs = [jnp.broadcast_to(suffix[None],
                                     (degree + 1,) + suffix.shape)] + curs
        v = _comb_batched(spec, degree, comb, curs, consts,
                          jnp.uint32(0))
        msg = F.modsum(spec, v, v.ndim - 2)      # [(3,) degree+1, 16]
        if eqsplit:
            msg = _scale_msg(spec, msg, wj, cfac, degree, shared)
        msg = _open_msg(spec, msg, mask, shared)
        a_next = None
        c_next = None
        if zk:
            msg = _zk_round(spec, degree, msg, zkarg)
        state = T.absorb_fes(spec, state, msg)
        state, r = T.challenge_fe(state)
        if zk:
            a_next = _zk_accum(spec, degree, zkarg[2], r, zkarg[6])
        if eqsplit:
            c_next = F.mul(spec, cfac, _eq_r(spec, wj, r))
        bound = [
            F.add(spec, e, F.mul(spec, jnp.broadcast_to(r, s.shape), s))
            for e, s in zip(evens, slopes)
        ]
        bound = [_pad_elems(b, polys[0].shape[-2]) for b in bound]
        return state, r, msg, bound, a_next, c_next

    return jax.jit(round_fn)


def _make_chunked_fn(spec: FieldSpec, degree: int, comb, shared: bool,
                     zk: bool = False, eqsplit: bool = False):
    """Large-round kernel: ONE compiled program for every round with active
    length > FIXED_CUTOFF.

    Tables live in fixed full-size buffers (element axis padded to a CHUNK
    multiple); the active length ``h`` and chunk count are traced scalars.
    Round evaluation and binding each run as a fori_loop over CHUNK-element
    slices; inactive positions are masked explicitly (no reliance on
    zero padding), and binding writes the half-length results back into the
    buffer prefix in place."""

    def round_fn(state, polys, h, n_chunks, mask=None, consts=None,
                 zkarg=None, eqarg=None):
        hh = CHUNK // 2
        pair_pos = jnp.arange(hh, dtype=jnp.uint32)
        if eqsplit:
            suf_buf, off, wj, cfac = eqarg

        def chunk_views(bufs, i):
            start = i * CHUNK
            cs = [jax.lax.dynamic_slice_in_dim(p, start, CHUNK,
                                               axis=p.ndim - 2)
                  for p in bufs]
            evens = [_elem_slice(c, slice(0, None, 2)) for c in cs]
            odds = [_elem_slice(c, slice(1, None, 2)) for c in cs]
            slopes = [F.sub(spec, o, e) for o, e in zip(odds, evens)]
            return evens, slopes

        def body_eval(i, acc):
            evens, slopes = chunk_views(polys, i)
            curs = [_t_stack(spec, e, s, degree)
                    for e, s in zip(evens, slopes)]
            if eqsplit:
                suffix = jax.lax.dynamic_slice_in_dim(
                    suf_buf, off + i * hh, hh, axis=0)
                curs = [jnp.broadcast_to(suffix[None],
                                         (degree + 1,) + suffix.shape)] \
                    + curs
            v = _comb_batched(spec, degree, comb, curs, consts,
                              i.astype(jnp.uint32))
            valid = (i.astype(jnp.uint32) * jnp.uint32(hh) + pair_pos) \
                < (h.astype(jnp.uint32) >> 1)
            v = jnp.where(valid[:, None], v, jnp.zeros_like(v))
            ev = F.modsum(spec, v, v.ndim - 2)
            return F.add(spec, acc, ev)

        lead = (3,) if shared else ()
        acc0 = jnp.zeros(lead + (degree + 1, F.NLIMBS), dtype=jnp.uint32)
        msg = jax.lax.fori_loop(0, n_chunks, body_eval, acc0)
        if eqsplit:
            msg = _scale_msg(spec, msg, wj, cfac, degree, shared)
        msg = _open_msg(spec, msg, mask, shared)
        a_next = None
        c_next = None
        if zk:
            msg = _zk_round(spec, degree, msg, zkarg)
        state = T.absorb_fes(spec, state, msg)
        state, r = T.challenge_fe(state)
        if zk:
            a_next = _zk_accum(spec, degree, zkarg[2], r, zkarg[6])
        if eqsplit:
            c_next = F.mul(spec, cfac, _eq_r(spec, wj, r))

        def body_bind(i, bufs):
            evens, slopes = chunk_views(bufs, i)
            bound = [
                F.add(spec, e, F.mul(spec, jnp.broadcast_to(r, s.shape), s))
                for e, s in zip(evens, slopes)
            ]
            # writes land strictly below later reads (i*CHUNK/2 + CHUNK/2
            # <= i*CHUNK for i >= 1; iteration 0 reads before it writes)
            return [
                jax.lax.dynamic_update_slice_in_dim(
                    p, b, i * hh, axis=p.ndim - 2)
                for p, b in zip(bufs, bound)
            ]

        new_polys = jax.lax.fori_loop(0, n_chunks, body_bind, list(polys))
        return state, r, msg, new_polys, a_next, c_next

    return jax.jit(round_fn)


@functools.partial(jax.jit, static_argnames=(
    "spec", "degree", "n_tabs", "lv", "eqs", "zk", "n_lv"))
def _lv_prove_scan(spec, degree, n_tabs, lv, eqs, zk, n_lv,
                   state, bufs, suf_rev, suf_offs, eq_split_arr,
                   zk_consts):
    """ALL fused-kernel rounds in ONE jitted program (lax.scan over j).

    Per-round Python dispatch through this environment's TPU relay costs
    ~1 ms per call; a round issues ~12 of them (eval, scale, absorb,
    challenge, bind, suffix slicing, ...), which dominated the fused
    kernels' actual work (measured 130 ms for a 2^16 prove). The kernels
    have round-invariant shapes (traced h/n_chunks, fixed buffers), so
    every round is the same program — a scan collapses the whole prefix
    of large rounds into one dispatch."""
    from . import sumcheck_pallas as SCP

    n = bufs[0].shape[-1]
    hh = min(SCP.HH, n // 2)

    def body(carry, j):
        state, bufs, cfac, acc_a = carry
        h = jnp.int32(n) >> j
        n_chunks = jnp.maximum(1, (h // 2) // hh)
        suffix = None
        wj = None
        if eqs:
            off = suf_offs[j]
            suffix = jax.lax.dynamic_slice(
                suf_rev, (0, off), (16, max(n // 2, hh)))
            wj = eq_split_arr[j]
        msg = SCP.eval_call(spec, degree, n_tabs, lv, eqs, list(bufs),
                            suffix, h, n_chunks)
        if eqs:
            msg = _scale_msg(spec, msg, wj, cfac, degree, False)
        if zk:
            rho1, u_evals, coeffs, zsuffix, pow_r, pow_r1 = zk_consts
            zkarg = (rho1, u_evals[j], coeffs[j], zsuffix[j], pow_r[j],
                     pow_r1[j], acc_a)
            msg = _zk_round(spec, degree, msg, zkarg)
        state = T.absorb_fes(spec, state, msg)
        state, r = T.challenge_fe(state)
        if zk:
            acc_a = _zk_accum(spec, degree, zk_consts[2][j], r, acc_a)
        if eqs:
            cfac = F.mul(spec, cfac, _eq_r(spec, wj, r))
        bufs = tuple(SCP.bind_call(spec, n_tabs, list(bufs), r, h,
                                   n_chunks))
        return (state, bufs, cfac, acc_a), (msg, r)

    cfac0 = F.ones_mont(spec)
    acc0 = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    (state, bufs, cfac, acc_a), (msgs, rs) = jax.lax.scan(
        body, (state, tuple(bufs), cfac0, acc0),
        jnp.arange(n_lv, dtype=jnp.int32))
    return state, bufs, cfac, acc_a, msgs, rs


class SumcheckResult(NamedTuple):
    state: jax.Array          # transcript state after all rounds
    challenges: jax.Array     # [nv, 16] Montgomery
    round_msgs: jax.Array     # [nv, degree+1, 16] public round evaluations
    final_polys: list         # each [..., 1, 16] — tables bound at r


def zk_mask_precompute(spec: FieldSpec, coeffs, degree: int):
    """Precompute per-round zk-mask tensors from coefficients [nv, d+1, 16].

    Returns (u_evals [nv, d+1, 16] — u_j at t=0..d, suffix [nv, 16],
    pow_r [nv, 16] = 2^(nv-j-1), pow_r1 [nv, 16] = 2^(nv-j-2) or 0 at the
    last round, g_sum [16] = sum of g over the hypercube)."""
    nv = coeffs.shape[0]
    u_evals = []
    for t in range(degree + 1):
        acc = coeffs[:, degree]
        for i in range(degree - 1, -1, -1):
            tf = F.from_int(spec, t)
            acc = F.add(spec, F.mul(spec, acc, jnp.broadcast_to(
                tf, acc.shape)), coeffs[:, i])
        u_evals.append(acc)
    u_evals = jnp.stack(u_evals, axis=1)            # [nv, d+1, 16]
    u01 = F.add(spec, u_evals[:, 0], u_evals[:, 1])  # [nv, 16]
    # suffix_j = sum_{k>j} (u_k(0)+u_k(1)) — reverse cumulative sum
    suffix = []
    run = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    for j in range(nv - 1, -1, -1):
        suffix.append(run)
        run = F.add(spec, run, u01[j])
    suffix = jnp.stack(suffix[::-1])
    g_sum = F.mul(spec, F.from_int(spec, 1 << (nv - 1)), F.modsum(spec, u01, 0))
    pow_r = F.from_int(spec, [1 << (nv - j - 1) for j in range(nv)])
    pow_r1 = F.from_int(spec,
                        [(1 << (nv - j - 2)) if j < nv - 1 else 0
                         for j in range(nv)])
    # the last round has R = 0 remaining vars: suffix term vanishes anyway
    return u_evals, suffix, pow_r, pow_r1, g_sum


def zk_mask_eval(spec: FieldSpec, coeffs, point):
    """g(z) = sum_var u_var(z_var) for coefficients [nv, d+1, 16]."""
    nv, d1, _ = coeffs.shape
    acc = coeffs[:, d1 - 1]
    for i in range(d1 - 2, -1, -1):
        acc = F.add(spec, F.mul(spec, acc, point), coeffs[:, i])
    return F.modsum(spec, acc, 0)


def prove(
    spec: FieldSpec,
    state,
    polys: Sequence[jax.Array],
    degree: int,
    comb: Callable,
    masks=None,
    shared: bool = False,
    consts=None,
    zk_mask=None,
    round_consts=None,
    eq_split=None,
) -> SumcheckResult:
    """Run all sumcheck rounds. ``polys`` tables must share element length 2^nv.

    ``masks``: optional [nv, 3, degree+1, 16] zero-share stacks (MPC
    re-randomization of round messages; sums to zero so the opened transcript
    values are unchanged).

    ``zk_mask``: optional (rho1 [16], coeffs [nv, degree+1, 16]) — fold the
    mask polynomial g into every round message (see _make_round_fn). The
    caller commits g and opens g(z) at the endpoint; the verifier's final
    check subtracts rho1 * g(z).

    ``round_consts``: optional list (len nv) of per-round tuples appended to
    ``consts`` each round — runtime data that must differ per round without
    recompiling (e.g. the correlated-rng counter feeding mul-chain reshare
    masks inside the comb). Shapes must be round-invariant.

    ``eq_split``: optional [nv, 16] challenge array (Dao-Thaler split-eq):
    ``polys`` must then EXCLUDE the eq table; the engine feeds each round's
    comb a read-only half-size suffix table as polys[0] (combs are
    unchanged) and applies the c_j * eq(tau_j, t) round factor — identical
    round messages to passing eq_table(eq_split) as polys[0], but the eq
    factor is never streamed full-size nor bound.
    """
    n = polys[0].shape[-2]
    nv = n.bit_length() - 1
    assert 1 << nv == n
    zk = zk_mask is not None
    eqs = eq_split is not None
    # fused limb-major Pallas rounds (TPU): two launches per round instead
    # of ~30 XLA ops per chunk — see ops/sumcheck_pallas.py. Covers the
    # public, const-free combs that advertise a limb-vector form.
    # LV_MODE: "auto" (TPU only), "force" (also CPU interpret — tests),
    # "off".
    lv_backend_ok = (jax.default_backend() == "tpu" if LV_MODE == "auto"
                     else LV_MODE == "force")
    use_lv = (
        lv_backend_ok
        and getattr(comb, "lv", None) is not None
        and not shared
        and masks is None
        and consts is None
        and round_consts is None
        # chunk pairs split 8 sublanes x hh/8 lanes; lanes must be >= 128
        and n >= (1 << 11)
        and all(p.ndim == 2 for p in polys)
    )
    key_c = (spec, degree, comb, shared, zk, eqs, "chunk")
    if key_c not in _round_fn_cache:
        _round_fn_cache[key_c] = _make_chunked_fn(spec, degree, comb, shared,
                                                  zk=zk, eqsplit=eqs)
    key_f = (spec, degree, comb, shared, zk, eqs, "fixed")
    if key_f not in _round_fn_cache:
        _round_fn_cache[key_f] = _make_fixed_fn(spec, degree, comb, shared,
                                                zk=zk, eqsplit=eqs)
    chunk_fn = _round_fn_cache[key_c]
    fixed_fn = _round_fn_cache[key_f]

    if zk:
        rho1, coeffs = zk_mask
        u_evals, suffix, pow_r, pow_r1, _ = zk_mask_precompute(
            spec, coeffs, degree)
        acc_a = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    if eqs and nv == 0:
        eqs = False
    if eqs:
        assert eq_split.shape[0] == nv
        sufs, _ = eq_suffix_tables(spec, eq_split)
        suf_buf = jnp.concatenate(sufs, axis=0)     # sizes n/2, n/4, .., 1
        # tail pad: a late round's CHUNK/2-wide slice must stay in bounds
        # (dynamic_slice clamps the start, which would shift the window)
        suf_buf = _pad_elems(suf_buf, max(n, CHUNK) + CHUNK // 2)
        suf_offs = [0]
        for s_tab in sufs[:-1]:
            suf_offs.append(suf_offs[-1] + s_tab.shape[0])
        cfac = F.ones_mont(spec)

    rs, msgs = [], []
    j0 = 0
    if use_lv:
        from . import ntt as _ntt
        from . import sumcheck_pallas as SCP

        hh = min(SCP.HH, n // 2)
        a_bits = hh.bit_length() - 1
        n_lv = max(0, nv - a_bits)     # rounds with h >= 2*hh
    if use_lv and n_lv > 0:
        # bit-reversed layout: y[q] = t[rev(q)] — pairs land at (q, q+h/2)
        # so the kernels read contiguous half-blocks (see sumcheck_pallas)
        bufs = tuple(_bitrev_rows(p, nv).T for p in polys)  # [16, n]
        n_tabs = len(bufs)
        suf_rev = jnp.zeros((16, 1), dtype=jnp.uint32)
        suf_offs = jnp.zeros((max(n_lv, 1),), dtype=jnp.int32)
        if eqs:
            sufs_r = eq_suffix_tables_rev(spec, eq_split)
            offs = [0]
            for s_tab in sufs_r[: n_lv - 1]:
                offs.append(offs[-1] + s_tab.shape[0])
            total = offs[-1] + sufs_r[n_lv - 1].shape[0]
            suf_rev = _pad_elems(
                jnp.concatenate(sufs_r[:n_lv], axis=0),
                total + n // 2).T                     # [16, padded]
            suf_offs = jnp.asarray(offs, dtype=jnp.int32)
        zk_consts = ()
        if zk:
            zk_consts = (rho1, u_evals, coeffs, suffix, pow_r, pow_r1)
        state, bufs, cfac_o, acc_o, msgs_arr, rs_arr = _lv_prove_scan(
            spec, degree, n_tabs, comb.lv, eqs, zk, n_lv,
            state, bufs, suf_rev, suf_offs,
            eq_split if eqs else jnp.zeros((1, F.NLIMBS), jnp.uint32),
            zk_consts)
        if eqs:
            cfac = cfac_o
        if zk:
            acc_a = acc_o
        rs = [rs_arr[j] for j in range(n_lv)]
        msgs = [msgs_arr[j] for j in range(n_lv)]
        j0 = n_lv
        h = n >> j0
        # back to element-major NATURAL order (rev is an involution)
        rev_out = jnp.asarray(
            _ntt._bitrev_idx(h.bit_length() - 1).astype("int32"))
        polys = [jnp.take(b[..., :h].T, rev_out, axis=0) for b in bufs]

    base = n >> j0
    in_fixed = base <= FIXED_CUTOFF
    if in_fixed:
        polys = [_pad_elems(p, FIXED_CUTOFF) for p in polys]
    else:
        # full-size buffers (a CHUNK multiple); the active prefix halves
        # each round while the buffers keep ONE compiled program alive
        polys = [_pad_elems(p, max(base, CHUNK)) for p in polys]
    for j in range(j0, nv):
        h = n >> j
        if not in_fixed and h <= FIXED_CUTOFF:
            # enter the fixed-shape regime: slice the active prefix out of
            # the big buffers (tail may hold stale bound values) and pad
            polys = [_pad_elems(_elem_slice(p, slice(0, h)), FIXED_CUTOFF)
                     for p in polys]
            in_fixed = True
        mask = None if masks is None else masks[j]
        zkarg = None
        if zk:
            zkarg = (rho1, u_evals[j], coeffs[j], suffix[j], pow_r[j],
                     pow_r1[j], acc_a)
        cj = consts
        if round_consts is not None:
            cj = tuple(consts or ()) + tuple(round_consts[j])
        eqarg = None
        if in_fixed:
            if eqs:
                eqarg = (_pad_elems(sufs[j], FIXED_CUTOFF // 2),
                         eq_split[j], cfac)
            state, r, msg, polys, a_next, c_next = fixed_fn(
                state, polys, mask, cj, zkarg, eqarg)
        else:
            if eqs:
                eqarg = (suf_buf, jnp.int32(suf_offs[j]), eq_split[j], cfac)
            n_chunks = max(1, h // CHUNK)
            state, r, msg, polys, a_next, c_next = chunk_fn(
                state, polys, jnp.int32(h), jnp.int32(n_chunks), mask, cj,
                zkarg, eqarg)
        if zk:
            acc_a = a_next
        if eqs:
            cfac = c_next
        rs.append(r)
        msgs.append(msg)
    # bound values live in the active prefix; index 0 is the final value
    polys = [_elem_slice(p, slice(0, 1)) for p in polys]
    return SumcheckResult(
        state=state,
        challenges=jnp.stack(rs),
        round_msgs=jnp.stack(msgs),
        final_polys=polys,
    )


def round_msgs_to_ints(round_msgs):
    """Device round messages [nv, d+1, 16] -> [[int]] for proof objects."""
    vals = F.to_int(FR, round_msgs)
    return [[int(v) for v in row] for row in vals]


# --- host-side verification -------------------------------------------------


def lagrange_eval_ints(evals, x: int, modulus: int) -> int:
    """Interpolate the degree-d poly through (i, evals[i]) and evaluate at x."""
    d = len(evals) - 1
    total = 0
    for i in range(d + 1):
        num, den = 1, 1
        for j in range(d + 1):
            if i == j:
                continue
            num = num * (x - j) % modulus
            den = den * (i - j) % modulus
        total = (total + evals[i] * num * pow(den, -1, modulus)) % modulus
    return total


def verify(
    round_msgs,
    claim: int,
    transcript: "T.HostTranscript",
    modulus: int = FR.modulus,
):
    """Walk the rounds on the host: check s(0)+s(1) == claim, derive r_j.

    ``round_msgs``: [nv][degree+1] ints. Returns (challenges, final_claim).
    Raises ValueError on a failed round check.
    """
    rs = []
    for j, evals in enumerate(round_msgs):
        if (evals[0] + evals[1]) % modulus != claim % modulus:
            raise ValueError(f"sumcheck round {j}: s(0)+s(1) != claim")
        transcript.absorb_many(evals)
        r = transcript.challenge()
        claim = lagrange_eval_ints(evals, r, modulus)
        rs.append(r)
    return rs, claim
