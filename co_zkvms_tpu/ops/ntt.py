"""Number-theoretic transform over BN254 Fr: on-chip radix-2 + meshed 4-step.

BASELINE's north star names "NTT/FFT with butterfly stages exchanged
all-to-all" as a required kernel (the reference stack itself is multilinear /
NTT-free — Spartan and Jolt commit to evaluations — but univariate PCS
pipelines built on this framework need coefficient<->evaluation transforms;
capability parity target: arkworks `Radix2EvaluationDomain` as used by
ark-poly consumers).

TPU-first design:

- single chip: iterative radix-2 DIT over the limb-vector layout ([N, 16]
  u32 Montgomery). One bit-reversal gather, then log2(N) butterfly stages;
  each stage is ONE batched field mul of N/2 elements (twiddles strided out
  of a doubling-built power table) + one modadd + one modsub — all three
  dispatch to the fused Pallas field kernels on TPU, so a stage streams the
  array a constant number of times and the whole NTT is ~log2(N) * N/2
  modmuls at the flat field-mul rate.
- mesh: four-step decomposition N = N1*N2 with the column/row NTTs local to
  each device and THREE jax.lax.all_to_all transposes riding ICI (the
  classic distributed FFT schedule): natural-row-sharded input ->
  column-sharded -> local N1-point NTTs -> twiddle w^(k1*n2) -> all_to_all
  -> local N2-point NTTs -> all_to_all + local transpose back to
  natural-order row shards. Built on shard_map so the same code runs on the
  8-device CPU test mesh and a pod slice.

Twiddle tables are built on device in log2(N) doubling steps (P[j + 2^i] =
P[j] * w^(2^i): one batched mul per step) and cached per (field, log_n,
direction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from .field import FR


def two_adic_root(spec, log_n: int, inverse: bool = False) -> int:
    """Primitive 2^log_n-th root of unity (host int, standard form).

    BN254 Fr has 2-adicity 28 with multiplicative generator 5 (matches
    arkworks' FrConfig so evaluation domains agree element-wise).
    """
    r = spec.modulus
    t, s = r - 1, 0
    while t % 2 == 0:
        t //= 2
        s += 1
    if log_n > s:
        raise ValueError(f"domain 2^{log_n} exceeds 2-adicity {s}")
    w = pow(5, t, r)
    assert pow(w, 1 << s, r) == 1 and pow(w, 1 << (s - 1), r) != 1
    w = pow(w, 1 << (s - log_n), r)
    if inverse:
        w = pow(w, r - 2, r)
    return w


@functools.lru_cache(maxsize=None)
def _twiddles(spec, log_n: int, inverse: bool):
    """Device table [N/2, 16]: w^j for j < N/2, Montgomery form.

    Always evaluated OUTSIDE any trace (callers hoist it out of jit) so the
    cache never holds tracers.
    """
    w = two_adic_root(spec, log_n, inverse)

    @jax.jit
    def build(steps):
        p = F.ones_mont(spec, (1,))
        for s in steps:
            p = jnp.concatenate([p, F.mul(spec, p, s)], axis=0)
        return p

    steps = [
        F.from_int(spec, [pow(w, 1 << i, spec.modulus)])
        for i in range(max(log_n - 1, 0))
    ]
    return build(tuple(steps)) if steps else F.ones_mont(spec, (1,))


@functools.lru_cache(maxsize=None)
def _bitrev_idx(log_n: int):
    # numpy (NOT jnp): this is called inside jit traces, where a jnp array
    # would be lifted to a tracer and poison the cache
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << np.uint32(log_n - 1 - b)
    return rev


def _butterfly_stages(spec, x, tw, log_n: int):
    """log_n DIT stages over axis -2 of a bit-reversed [..., N, 16] array."""
    n = 1 << log_n
    lead = x.shape[:-2]
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m >> 1
        stride = n // m
        xv = x.reshape(lead + (n // m, m, 16))
        u = xv[..., :half, :]
        v = xv[..., half:, :]
        t = F.mul(spec, v, tw[: half * stride : stride])
        x = jnp.concatenate(
            [F.add(spec, u, t), F.sub(spec, u, t)], axis=-2
        ).reshape(lead + (n, 16))
    return x


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def _ntt_jit(spec, x, tw, n_inv, log_n: int, inverse: bool):
    x = jnp.take(x, _bitrev_idx(log_n), axis=-2)
    x = _butterfly_stages(spec, x, tw, log_n)
    if inverse:
        x = F.mul(spec, x, n_inv[0])
    return x


@functools.lru_cache(maxsize=None)
def _n_inv(spec, log_n: int):
    return F.from_int(spec, [pow(1 << log_n, spec.modulus - 2, spec.modulus)])


def ntt(spec, x, inverse: bool = False):
    """Forward/inverse NTT along axis -2 of a [..., N, 16] Montgomery array.

    Natural-order in, natural-order out; N must be a power of two within the
    field's 2-adic domain. ntt(intt(x)) == x; forward evaluates the
    coefficient vector on the 2^log_n roots-of-unity domain in standard
    order (w^0, w^1, ...), matching arkworks Radix2EvaluationDomain.fft.
    """
    n = x.shape[-2]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "NTT length must be a power of two"
    return _ntt_jit(spec, x, _twiddles(spec, log_n, inverse),
                    _n_inv(spec, log_n), log_n, inverse)


def intt(spec, x):
    return ntt(spec, x, inverse=True)


def mul_polys(spec, a, b):
    """Polynomial product via NTT (degree < N/2 each, length-N arrays)."""
    fa = ntt(spec, a)
    fb = ntt(spec, b)
    return intt(spec, F.mul(spec, fa, fb))


# --- meshed four-step NTT ----------------------------------------------------


def ntt_mesh(spec, x, mesh, axis: str = "x", inverse: bool = False):
    """Distributed NTT: natural-order [N, 16] sharded on rows of the mesh.

    Four-step schedule N = N1*N2 (see module docstring): both sub-NTTs run
    as the single-chip butterfly kernel on local shards; the three global
    transposes are tiled jax.lax.all_to_all collectives on ``axis``. Output
    is natural-order with the same sharding as the input.

    Matches ntt()/intt() bit-exactly (tested on the 8-device CPU mesh).
    Derivation: with n = n1*N2 + n2 and k = k1 + N1*k2,
      X[k] = NTT2_{n2->k2}[ w^(k1*n2) * NTT1_{n1->k1}[x[n1, n2]] ],
    so natural-order output is the flattened transpose of the step-3 result.
    """
    from jax.sharding import NamedSharding, PartitionSpec
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 fallback
        from jax.experimental.shard_map import shard_map

    n = x.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    p = mesh.shape[axis]
    log_p = p.bit_length() - 1
    assert 1 << log_p == p
    # split N = N1 * N2 near-evenly; both factors must be >= P for regular
    # shards on every transpose
    log_n1 = max(log_p, log_n // 2)
    log_n2 = log_n - log_n1
    assert log_n2 >= log_p, "mesh too large for this NTT size"
    n1, n2 = 1 << log_n1, 1 << log_n2
    r = spec.modulus
    w = two_adic_root(spec, log_n, inverse)
    tw_n1 = _twiddles(spec, log_n1, inverse)
    tw_n2 = _twiddles(spec, log_n2, inverse)
    rev1 = _bitrev_idx(log_n1)
    rev2 = _bitrev_idx(log_n2)
    # cross twiddle w^(k1*n2) gathers from the full power table [N, 16]:
    # extend the cached [N/2] table via w^(N/2 + j) = w^(N/2) * w^j
    tw_half = _twiddles(spec, log_n, inverse)
    w_half = F.from_int(spec, [pow(w, n // 2, r)])
    tw_ext = jnp.concatenate([tw_half, F.mul(spec, tw_half, w_half[0])])

    def local(xs, tw_ext):
        # xs: flat [N/P, 16] natural-order shard = row block [N1/P, N2, 16]
        xs = xs.reshape(n1 // p, n2, 16)
        me = jax.lax.axis_index(axis)
        # transpose 1: -> [N1, N2/P] (all rows, column block `me`)
        a = jax.lax.all_to_all(xs, axis, 1, 0, tiled=True)
        a = jnp.swapaxes(a, 0, 1)                      # [N2/P, N1, 16]
        # step 1: local N1-point NTTs over n1
        a = jnp.take(a, rev1, axis=-2)
        a = _butterfly_stages(spec, a, tw_n1, log_n1)  # A[n2_local, k1]
        # step 2: cross twiddle w^(k1 * n2_global)
        n2_global = jnp.uint32(me) * jnp.uint32(n2 // p) + jnp.arange(
            n2 // p, dtype=jnp.uint32)
        k1 = jnp.arange(n1, dtype=jnp.uint32)
        expo = (n2_global[:, None] * k1[None, :]) & jnp.uint32(n - 1)
        a = F.mul(spec, a, tw_ext[expo])               # [N2/P, N1, 16]
        # transpose 2: -> [N2, N1/P] (all n2, k1 block `me`)
        a = jax.lax.all_to_all(a, axis, 1, 0, tiled=True)
        a = jnp.swapaxes(a, 0, 1)                      # [N1/P, N2, 16]
        # step 3: local N2-point NTTs over n2
        a = jnp.take(a, rev2, axis=-2)
        a = _butterfly_stages(spec, a, tw_n2, log_n2)  # B[k1_local, k2]
        # transpose 3: X viewed [N2, N1] has rows k2 -> return k2 blocks
        a = jax.lax.all_to_all(a, axis, 1, 0, tiled=True)  # [N1, N2/P]
        a = jnp.swapaxes(a, 0, 1)                      # [N2/P, N1, 16]
        out = a.reshape(n // p, 16)
        if inverse:
            n_inv = F.from_int(spec, [pow(n, r - 2, r)])
            out = F.mul(spec, out, n_inv[0])
        return out

    sharding = NamedSharding(mesh, PartitionSpec(axis))
    # check_vma off: field ops build unvarying constants (zero columns)
    # inside lax.scan carries, which trips the varying-manual-axes check
    try:
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(PartitionSpec(axis), PartitionSpec()),
            out_specs=PartitionSpec(axis), check_vma=False,
        )
    except TypeError:  # older jax: the kwarg was check_rep
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(PartitionSpec(axis), PartitionSpec()),
            out_specs=PartitionSpec(axis), check_rep=False,
        )
    x = jax.device_put(x.reshape(n, 16), sharding)
    return jax.jit(fn)(x, tw_ext)
