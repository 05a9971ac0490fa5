"""Fused Pallas TPU kernels for sumcheck rounds (limb-major tables).

The generic engine (ops/sumcheck.py) evaluates each round as ~30 XLA ops
per chunk; on TPU every F.mul pays limb-layout transposes at the Pallas
kernel boundary and every elementwise op streams HBM — measured 284 ms for
a degree-3 4-table 2^20 prove (~0.3% of the bandwidth roofline, r5 probe).

Here a round is TWO Pallas launches over limb-major [16, N] buffers:

- eval kernel: per grid step, stream one chunk of every table's
  even/odd lanes, build the t = 0..degree restrictions incrementally,
  run the comb's limb-vector form (``comb.lv``) entirely in VMEM, mask
  inactive pairs, and write the chunk's LOOSE digit sums (one row per
  grid step — no cross-step carries, so no in-kernel reduction); the
  host-side wrapper lazy-reduces the tiny [n_steps, d+1, 16] output.
- bind kernel: bound = even + r * (odd - even) written into the lane
  prefix of same-size output buffers, same chunking (fixed buffer size
  keeps ONE compiled program per instance).

Tables live in BIT-REVERSED order (y[q] = t[rev(q)]): since
rev(2p + b) = b*2^(m-1) + rev_(m-1)(p), the x_0 pair (2p, 2p+1) sits at
lanes (q, q + h/2) — contiguous half-blocks, so the kernels never need
strided access (Mosaic supports neither strided vector extracts nor
strided ref loads, and an XLA-level stride-2 slice costs an HBM relayout
per table per round — measured 2.2 s/prove at 2^20). Binding writes the
bound value back to lane q, which IS the bit-reversed position of pair p
one variable down, so the layout self-maintains; round messages are
plain modular sums over all pairs, which are permutation-invariant, so
the transcript is bit-identical to the natural-order engine. The engine
applies rev once per table at entry and the inverse (rev is an
involution) on the tiny active prefix at exit.

Both kernels take the active length h and chunk count as scalar-prefetch
values, so every round of an instance reuses the same two compiled
programs (the compile-boundedness property of the XLA chunked engine is
preserved). Bit-exact with the jnp path: identical field ops, and the
modular chunk sums only re-associate exact uint32 additions.

Combs advertise a kernel form via ``comb.lv``: a function
``lv(f, curs) -> limb-list`` where ``curs`` are limb-lists (16 arrays,
each [lanes]; stacked tables arrive as [k, lanes] entries and the lv
comb MUST reduce the k axis itself via ``f.modsum0`` so the returned
entries are [lanes] canonical digits) and ``f`` is _LvOps below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import field as F
from . import field_pallas as FP
from .field import FieldSpec

# lanes per chunk PAIR: sized so a degree-3 3-table comb's working set
# stays inside VMEM with double buffering (hh=8192 hit a 43 MB scoped
# stack vs the 16 MB default; 4096 fits under the raised 48 MB cap)
HH = 1 << 13
_VMEM_LIMIT = 48 * 1024 * 1024


class _LvOps:
    """In-kernel field ops on limb-lists (16 u32 arrays, canonical
    Montgomery digits). Thin veneer over field_pallas helpers so lv comb
    code reads like its jnp comb."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.m = [int(v) for v in spec.mod_limbs]
        self.n0 = spec.n0inv
        self.one = [int(v) for v in spec.one_mont]
        self.r2 = [int(v) for v in spec.r2_limbs]

    def mul(self, a, b):
        return FP._mm(a, b, self.m, self.n0)

    def add(self, a, b):
        return FP._madd(a, b, self.m)

    def sub(self, a, b):
        return FP._msub(a, b, self.m)

    def ones_like(self, a):
        return [jnp.full_like(a[0], v) for v in self.one]

    def zeros_like(self, a):
        return [jnp.zeros_like(a[0]) for _ in range(16)]

    def modsum0(self, a):
        """Modular sum over the leading axis of [k, lanes] limb entries.

        Digit-wise u32 sums stay exact for k <= 2^16; the loose columns
        are reduced back to canonical digits via REDC * R^2."""
        loose = [jnp.sum(x, axis=0, dtype=jnp.uint32) for x in a]
        return self.lazy_reduce(loose)

    def lazy_reduce(self, loose):
        """Canonicalize 16 loose u32 digit columns (value < 2^509)."""
        cols = [None] * 32
        carry = None
        for k in range(16):
            v = loose[k] if carry is None else loose[k] + carry
            cols[k] = v & FP.MASK
            carry = v >> FP.SIXTEEN
        cols[16] = carry
        zero = jnp.zeros_like(loose[0])
        for k in range(17, 32):
            cols[k] = zero
        red = FP._redc_cols(list(cols), self.m, self.n0)  # value * R^{-1}
        r2 = [jnp.full_like(loose[0], v) for v in self.r2]
        return FP._mm(red, r2, self.m, self.n0)           # * R^2 * R^{-1}


def _limbs(arr):
    """[16, 1, 8, HL] chunk block -> limb-list of [8, HL] 2-D entries.

    Limb rows are 2-D (8 sublanes x HL lanes) so every vreg is fully
    packed — 1-D [hh]-lane rows occupied only one sublane per vreg and
    ran the whole kernel at 1/8 VPU utilization (measured ~6 ms for a
    2^16 eval that should cost ~0.2 ms)."""
    return [arr[i, 0] for i in range(16)]


def _eval_kernel_body(scal_ref, *refs, spec, degree, n_tabs, lv,
                      eqsplit, hh):
    """One grid step: chunk i of every table -> loose digit sums row i."""
    from jax.experimental import pallas as pl

    f = _LvOps(spec)
    i = pl.program_id(0)
    h = scal_ref[0]
    n_chunks = scal_ref[1]
    out_ref = refs[-1]
    in_refs = refs[:-1]

    @pl.when(i >= n_chunks)
    def _():
        out_ref[0] = jnp.zeros((degree + 1, 8, 128), dtype=jnp.uint32)

    @pl.when(i < n_chunks)
    def _():
        idx = 0
        suffix = None
        if eqsplit:
            suffix = _limbs(in_refs[idx][...])
            idx += 1
        evens, slopes = [], []
        for t in range(n_tabs):
            e = _limbs(in_refs[idx][...])
            o = _limbs(in_refs[idx + 1][...])
            idx += 2
            evens.append(e)
            slopes.append(f.sub(o, e))
        # pair validity: global pair index < h/2; element (s, l) of the
        # chunk is pair i*hh + s*HL + l
        hl = hh // 8
        sub = jax.lax.broadcasted_iota(jnp.uint32, (8, hl), 0)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (8, hl), 1)
        pos = sub * jnp.uint32(hl) + lane
        valid = (jnp.uint32(i) * jnp.uint32(hh) + pos) \
            < (jnp.uint32(h) >> 1)
        rows = []
        curs = [list(e) for e in evens]
        for t in range(degree + 1):
            if t > 0:
                curs = [f.add(c, s) for c, s in zip(curs, slopes)]
            args = ([suffix] + curs) if eqsplit else list(curs)
            v = lv(f, args)             # limb-list of [8, HL]
            vst = jnp.stack([jnp.where(valid, x, jnp.uint32(0))
                             for x in v])               # [16, 8, HL]
            # minor-axis reduction only, keeping every intermediate
            # rank >= 2 (Mosaic crashes on rank-1 vector layouts) and
            # signed (no unsigned reductions); per-sublane partials over
            # HL <= 2^10 lanes stay < 2^26, exact in int32
            s2 = jnp.sum(vst.astype(jnp.int32), axis=2, dtype=jnp.int32)
            s2 = jnp.swapaxes(s2.astype(jnp.uint32), 0, 1)     # [8, 16]
            rows.append(jnp.concatenate(
                [s2, jnp.zeros((8, 112), dtype=jnp.uint32)], axis=1))
        out_ref[0] = jnp.stack(rows)    # [degree+1, 8, 128]


def _bind_kernel_body(scal_ref, *refs, spec, n_tabs, hh):
    """bound = even + r * (odd - even), one chunk per grid step."""
    from jax.experimental import pallas as pl

    f = _LvOps(spec)
    i = pl.program_id(0)
    n_chunks = scal_ref[1]
    in_refs = refs[: 2 * n_tabs]
    out_refs = refs[2 * n_tabs:]

    @pl.when(i < n_chunks)
    def _():
        r = [jnp.uint32(scal_ref[2 + k]) for k in range(16)]
        for t in range(n_tabs):
            e = _limbs(in_refs[2 * t][...])
            o = _limbs(in_refs[2 * t + 1][...])
            s = f.sub(o, e)
            rb = [jnp.broadcast_to(x, s[0].shape) for x in r]
            b = f.add(e, f.mul(rb, s))
            for k in range(16):
                out_refs[t][k, 0] = b[k]


def _as4d(b, hh):
    """[16, n] buffer -> [16, n/hh, 8, hh/8] chunk-blocked sublane view."""
    n = b.shape[-1]
    return b.reshape(16, n // hh, 8, hh // 8)


def _specs_for(bufs, hh, pl, pltpu):
    """Two (16, 1, 8, hh/8) blocks per table per grid step: evens from
    the buffer prefix (chunk i), odds from the active second half (chunk
    h/(2*hh) + i, computed from the scalar-prefetched h — index maps may
    read the scalar ref). The same (reshaped) buffer is passed twice."""
    def ev_map(i, s):
        return (0, i, 0, 0)

    def od_map(i, s):
        return (0, s[0] // (2 * hh) + i, 0, 0)

    specs, args = [], []
    for b in bufs:
        b4 = _as4d(b, hh)
        sp_shape = (16, 1, 8, hh // 8)
        specs += [pl.BlockSpec(sp_shape, ev_map, memory_space=pltpu.VMEM),
                  pl.BlockSpec(sp_shape, od_map, memory_space=pltpu.VMEM)]
        args += [b4, b4]
    return specs, args


def eval_call(spec, degree: int, n_tabs: int, lv, eqsplit: bool,
              bufs, suffix, h, n_chunks):
    """One round's message sums (trace-inlinable — called from inside the
    engine's fused round scan). ``bufs``: per-table limb-major [16, Nbuf]
    (or [k, 16, Nbuf]) in BIT-REVERSED element order; ``suffix``:
    [16, >=Nbuf//2] rev-ordered or None. Returns canonical message evals
    [degree+1, 16]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbuf = bufs[0].shape[-1]
    hh = min(HH, nbuf // 2)
    n_steps = max(1, (nbuf // 2) // hh)

    in_specs, args = _specs_for(bufs, hh, pl, pltpu)
    if eqsplit:
        in_specs = [pl.BlockSpec((16, 1, 8, hh // 8),
                                 lambda i, s: (0, i, 0, 0),
                                 memory_space=pltpu.VMEM)] + in_specs
        sl = suffix.shape[-1] - suffix.shape[-1] % hh
        args = [_as4d(suffix[:, :sl], hh)] + args

    kernel = functools.partial(
        _eval_kernel_body, spec=spec, degree=degree, n_tabs=n_tabs,
        lv=lv, eqsplit=eqsplit, hh=hh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, degree + 1, 8, 128),
                               lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    scal = jnp.stack([jnp.int32(h), jnp.int32(n_chunks)])
    loose = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_steps, degree + 1, 8, 128),
                                       jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() != "tpu",
    )(scal, *args)
    # [n_steps, d+1, 8, 16] per-sublane partials -> loose digit rows
    loose = jnp.sum(loose[:, :, :, :16], axis=2)  # [n_steps, d+1, 16]
    canon = F.lazy_reduce(spec, loose)
    return F.modsum(spec, canon, 0)               # [d+1, 16]


def bind_call(spec, n_tabs: int, bufs, r, h, n_chunks):
    """Bind x_0 <- r (trace-inlinable). Returns SAME-SIZE buffers holding
    the bound tables in lanes [0, h//2) (tail lanes undefined, masked by
    later rounds — fixed buffer size keeps one compiled program per
    instance). The bit-reversed layout self-maintains: lane q holds pair
    p = rev(q), and the bound value written at q is exactly t'[p] in the
    one-variable-smaller rev order."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbuf = bufs[0].shape[-1]
    hh = min(HH, nbuf // 2)
    n_steps = max(1, (nbuf // 2) // hh)

    in_specs, args = _specs_for(bufs, hh, pl, pltpu)
    out_specs, out_shapes = [], []
    for b in bufs:
        out_specs.append(pl.BlockSpec((16, 1, 8, hh // 8),
                                      lambda i, s: (0, i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(
            (16, nbuf // hh, 8, hh // 8), jnp.uint32))

    kernel = functools.partial(
        _bind_kernel_body, spec=spec, n_tabs=n_tabs, hh=hh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
    )
    scal = jnp.concatenate([
        jnp.stack([jnp.int32(h), jnp.int32(n_chunks)]),
        r.astype(jnp.int32),
    ])
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() != "tpu",
    )(scal, *args)
    outs = list(outs) if isinstance(outs, (tuple, list)) else [outs]
    return [o.reshape(16, nbuf) for o in outs]


# jitted standalone wrappers (unit tests / one-off rounds)
eval_round = functools.partial(jax.jit, static_argnames=(
    "spec", "degree", "n_tabs", "lv", "eqsplit"))(eval_call)
bind_round = functools.partial(jax.jit, static_argnames=(
    "spec", "n_tabs"))(bind_call)
