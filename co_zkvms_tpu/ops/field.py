"""BN254 prime-field arithmetic as TPU-native multi-limb uint32 vector ops.

Design: a field element is 16 limbs of 16 bits stored in a uint32 array with
the limb axis LAST (shape ``[..., 16]``, little-endian limbs), kept in
Montgomery form (R = 2^256) between operations.  All arithmetic uses only
uint32 ops (mul/add/and/shift) so it runs natively on the TPU VPU — TPUs have
no 64-bit integer datapath.  16x16-bit limb products fit exactly in uint32;
partial products are split into lo/hi halves immediately and accumulated in
"loose" columns (< 2^23), so carry propagation is deferred to a single
16/32-step chain per operation.

This module is the jnp reference path; fused Pallas kernels for the hot
compound ops (sumcheck round folds, MSM inner loops) live in
``field_pallas.py`` and must match it bit-exactly.

Capability parity: replaces the reference's arkworks ``ark-ff`` BN254 field
backend (patched ``v0.5.0-optimize-mul-u64``; see SURVEY.md §0) and
``snarks-core/src/field.rs`` (``FieldExt::TWO_INV``).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field as _dfield

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Limb configuration
# ---------------------------------------------------------------------------

LIMB_BITS = 16
NLIMBS = 16  # 256 bits total
MASK = (1 << LIMB_BITS) - 1
U32 = jnp.uint32

# BN254 moduli.
FR_MODULUS = 21888242871839275222246405745257275088548364400416034343698204186575808495617
FQ_MODULUS = 21888242871839275222246405745257275088696311157297823662689037894645226208583


def int_to_limbs(x: int, n: int = NLIMBS) -> np.ndarray:
    """Python int -> little-endian uint32 limb array of 16-bit digits."""
    return np.array([(x >> (LIMB_BITS * i)) & MASK for i in range(n)], dtype=np.uint32)


def limbs_to_int(limbs) -> int:
    """uint32 limb vector (last axis) -> Python int. Host-side only."""
    limbs = np.asarray(limbs)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(limbs))


@dataclass(frozen=True)
class FieldSpec:
    """Static parameters of a prime field in 16x16-bit Montgomery form."""

    name: str
    modulus: int
    # Derived constants (host numpy; jnp-converted lazily at trace time).
    mod_limbs: np.ndarray = _dfield(repr=False, default=None)
    n0inv: int = 0              # -modulus^{-1} mod 2^16
    r_mod: int = 0              # R mod modulus (Montgomery form of 1)
    r2: int = 0                 # R^2 mod modulus
    r_inv: int = 0              # R^{-1} mod modulus
    one_mont: np.ndarray = _dfield(repr=False, default=None)
    r2_limbs: np.ndarray = _dfield(repr=False, default=None)
    zero: np.ndarray = _dfield(repr=False, default=None)
    two_inv: int = 0            # (modulus+1)/2 — maps FieldExt::TWO_INV

    def __hash__(self):
        return hash((self.name, self.modulus))

    def __eq__(self, other):
        return isinstance(other, FieldSpec) and self.modulus == other.modulus


def _make_spec(name: str, modulus: int) -> FieldSpec:
    R = 1 << (LIMB_BITS * NLIMBS)
    n0inv = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
    r_mod = R % modulus
    r2 = (R * R) % modulus
    r_inv = pow(R, -1, modulus)
    return FieldSpec(
        name=name,
        modulus=modulus,
        mod_limbs=int_to_limbs(modulus),
        n0inv=n0inv,
        r_mod=r_mod,
        r2=r2,
        r_inv=r_inv,
        one_mont=int_to_limbs(r_mod),
        r2_limbs=int_to_limbs(r2),
        zero=np.zeros(NLIMBS, dtype=np.uint32),
        two_inv=(modulus + 1) // 2,
    )


FR = _make_spec("bn254_fr", FR_MODULUS)
FQ = _make_spec("bn254_fq", FQ_MODULUS)


# ---------------------------------------------------------------------------
# Carry / borrow chains (the only sequential parts; lengths are static 16/32)
# ---------------------------------------------------------------------------


def _shift_up(x, k: int):
    """Shift digits toward higher limb indices along the last axis (zeros in)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
    return jnp.pad(x[..., :-k], pad)


def _ks_resolve(s, n: int):
    """Kogge-Stone carry resolution over digit sums ``s`` (< 2^17 each).

    Returns (canonical digits, carry_out in {0,1}). The carry recurrence
    c_{i+1} = g_i | (p_i & c_i) is a prefix computation: log2(n) fully
    vectorized rounds over the limb axis instead of an n-step lax.scan of
    per-digit micro-kernels (the scan form issued 16 sequential launches
    per add on TPU — the round-4 sumcheck/bind bottleneck). Bit-exact.
    """
    g = s >> LIMB_BITS                     # generates carry (0/1)
    p = ((s & MASK) == MASK).astype(U32)   # propagates carry-in
    k = 1
    while k < n:
        gs = _shift_up(g, k)
        ps = _shift_up(p, k)
        g = g | (p & gs)
        p = p & ps
        k <<= 1
    carry_in = _shift_up(g, 1)
    out = (s + carry_in) & MASK
    return out, g[..., n - 1]


def _carry_canonicalize(cols, n_out: int):
    """Propagate carries through loose uint32 columns -> canonical 16-bit digits.

    ``cols``: [..., K] with each entry < 2^32 - slack. Returns ([..., n_out],
    carry_out) where digits < 2^16. Split each column into lo/hi halves, add
    the shifted hi stream, then one Kogge-Stone resolution — all vectorized
    over the limb axis (no sequential scan).
    """
    k = cols.shape[-1]
    if k < n_out:
        cols = jnp.concatenate(
            [cols, jnp.zeros(cols.shape[:-1] + (n_out - k,), dtype=U32)], axis=-1
        )
    x = cols[..., :n_out]
    lo = x & MASK
    hi = x >> LIMB_BITS                    # each <= 2^16 - 1
    s = lo + _shift_up(hi, 1)              # < 2^17 - 1
    out, c = _ks_resolve(s, n_out)
    return out, hi[..., n_out - 1] + c


def _sub_limbs(a, b):
    """a - b over canonical digits; returns (diff canonical, borrow_out in {0,1})."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    n = shape[-1]
    d = a - b                              # wraps mod 2^32
    g = d >> 31                            # borrow generated (0/1)
    p = ((d & MASK) == 0).astype(U32)      # borrow propagates
    k = 1
    while k < n:
        gs = _shift_up(g, k)
        ps = _shift_up(p, k)
        g = g | (p & gs)
        p = p & ps
        k <<= 1
    borrow_in = _shift_up(g, 1)
    return (d - borrow_in) & MASK, g[..., n - 1]


def _add_limbs(a, b):
    """a + b over canonical digits; returns (sum canonical, carry_out)."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    return _ks_resolve(a + b, shape[-1])


def _select(cond, a, b):
    """Elementwise select on the leading (batch) shape; cond: [...] bool/int."""
    return jnp.where(cond[..., None].astype(bool), a, b)


# ---------------------------------------------------------------------------
# Modular ring ops (Montgomery domain)
# ---------------------------------------------------------------------------


def _jit_spec(fn):
    """jit with the FieldSpec (arg 0) static; keeps eager use fast."""
    return functools.partial(jax.jit, static_argnums=0)(fn)


@_jit_spec
def add(spec: FieldSpec, a, b):
    """(a + b) mod m. Canonical in, canonical out."""
    m = jnp.asarray(spec.mod_limbs)
    s, carry = _add_limbs(a, b)
    d, borrow = _sub_limbs(s, jnp.broadcast_to(m, s.shape))
    # subtract m iff s >= m, i.e. carry_out==1 or no borrow in s-m
    take_d = jnp.logical_or(carry.astype(bool), jnp.logical_not(borrow.astype(bool)))
    return _select(take_d, d, s)


@_jit_spec
def sub(spec: FieldSpec, a, b):
    """(a - b) mod m."""
    m = jnp.asarray(spec.mod_limbs)
    d, borrow = _sub_limbs(a, b)
    dm, _ = _add_limbs(d, jnp.broadcast_to(m, d.shape))
    return _select(borrow.astype(bool), dm, d)


@_jit_spec
def neg(spec: FieldSpec, a):
    """(-a) mod m."""
    m = jnp.asarray(spec.mod_limbs)
    d, _ = _sub_limbs(jnp.broadcast_to(m, a.shape), a)
    # m - 0 = m must map back to 0
    is_zero = jnp.all(a == 0, axis=-1)
    return _select(is_zero, jnp.zeros_like(a), d)


def _mul_columns(a, b):
    """Schoolbook 16x16-digit product -> 32 loose columns (each < 2^22).

    Fully unrolled (straight-line elementwise ops XLA fuses into one
    kernel); per-column accumulators keep peak memory at O(batch * 32) —
    never the full [batch, 16, 16] outer product (which OOMs HBM at
    2^20-element batches). Used for small batches only; large TPU batches
    dispatch to the Pallas kernel from mul().
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    cols = [None] * (2 * NLIMBS)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(NLIMBS):
        p = a[..., i, None] * b            # [..., 16], each < 2^32
        lo = p & MASK
        hi = p >> LIMB_BITS
        for j in range(NLIMBS):
            acc(i + j, lo[..., j])
            acc(i + j + 1, hi[..., j])
    zero = jnp.zeros(shape[:-1], dtype=U32)
    return jnp.stack([zero if c is None else c for c in cols], axis=-1)


def _redc(spec: FieldSpec, t_digits):
    """Montgomery reduction of a canonical 32-digit value T < m*R.

    Returns T * R^{-1} mod m as canonical 16 digits. Fully unrolled (the
    same column recurrence as the Pallas kernel's _redc_cols): per step i,
    add m * mi to zero column i exactly, push its carry into column i+1.
    Columns stay < 2^22 so uint32 never overflows; straight-line
    elementwise ops XLA fuses into one kernel (the lax.scan form issued 16
    sequential launches per reduction on TPU).
    """
    n0 = jnp.uint32(spec.n0inv)
    mj = jnp.asarray(spec.mod_limbs)
    cols = [t_digits[..., k] for k in range(2 * NLIMBS)]
    for i in range(NLIMBS):
        mi = (cols[i] * n0) & MASK
        p = mi[..., None] * mj            # [..., 16], each < 2^32
        lo = p & MASK
        hi = p >> LIMB_BITS
        for j in range(NLIMBS):
            cols[i + j] = cols[i + j] + lo[..., j]
            cols[i + j + 1] = cols[i + j + 1] + hi[..., j]
        cols[i + 1] = cols[i + 1] + (cols[i] >> LIMB_BITS)
    t = jnp.stack(cols[NLIMBS:], axis=-1)
    res, carry = _carry_canonicalize(t, NLIMBS)
    # result < 2m (since T < m*R) => at most one subtraction; carry means >= 2^256 > m
    mb = jnp.asarray(spec.mod_limbs)
    d, borrow = _sub_limbs(res, jnp.broadcast_to(mb, res.shape))
    take_d = jnp.logical_or(carry.astype(bool), jnp.logical_not(borrow.astype(bool)))
    return _select(take_d, d, res)


@_jit_spec
def mul(spec: FieldSpec, a, b):
    """Montgomery product: a * b * R^{-1} mod m. Canonical in/out.

    On TPU, large batches dispatch to the fused Pallas kernel
    (field_pallas.py) — bit-exact with the jnp path below.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    batch = 1
    for d in shape[:-1]:
        batch *= d
    if batch >= 16 and jax.default_backend() == "tpu":
        from . import field_pallas

        return field_pallas.mul(spec, a, b)
    cols = _mul_columns(a, b)
    t, carry = _carry_canonicalize(cols, 2 * NLIMBS)
    del carry  # a*b < m^2 < R^2 => fits in 32 digits exactly
    return _redc(spec, t)


def square(spec: FieldSpec, a):
    batch = 1
    for d in a.shape[:-1]:
        batch *= d
    if batch >= 16 and jax.default_backend() == "tpu":
        from . import field_pallas

        return field_pallas.square(spec, a)
    return mul(spec, a, a)


def mul_small(spec: FieldSpec, a, k: int):
    """a * k for a small non-Montgomery host constant k (result stays in the
    same domain as ``a``): computed as repeated addition tree. k must be >= 0."""
    if k == 0:
        return jnp.zeros_like(a)
    acc = None
    base = a
    while k:
        if k & 1:
            acc = base if acc is None else add(spec, acc, base)
        k >>= 1
        if k:
            base = add(spec, base, base)
    return acc


def to_mont(spec: FieldSpec, a):
    """Standard -> Montgomery form (a*R mod m). Input canonical < m."""
    return mul(spec, a, jnp.asarray(spec.r2_limbs))


@_jit_spec
def from_mont(spec: FieldSpec, a):
    """Montgomery -> standard form (a*R^{-1} mod m)."""
    t = jnp.zeros(a.shape[:-1] + (2 * NLIMBS,), dtype=U32)
    t = t.at[..., :NLIMBS].set(a)
    return _redc(spec, t)


@functools.partial(jax.jit, static_argnums=(0, 2))
def pow_const(spec: FieldSpec, a, e: int):
    """a^e for host-known exponent e (square-and-multiply, Montgomery in/out).

    Small exponents unroll; large ones run as a lax.scan over exponent bits
    (keeps trace size O(1) for the 254-bit Fermat inversion exponent).
    """
    if e == 0:
        return jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape)
    if e.bit_length() <= 8:
        result = None
        base = a
        while e:
            if e & 1:
                result = base if result is None else mul(spec, result, base)
            e >>= 1
            if e:
                base = square(spec, base)
        return result
    bits = jnp.array([(e >> i) & 1 for i in range(e.bit_length())], dtype=U32)

    def body(carry, bit):
        result, base = carry
        new_result = _select(
            jnp.broadcast_to(bit, result.shape[:-1]).astype(bool),
            mul(spec, result, base),
            result,
        )
        return (new_result, square(spec, base)), None

    init = (jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape), a)
    (result, _), _ = jax.lax.scan(body, init, bits)
    return result


def inv(spec: FieldSpec, a):
    """a^{-1} via Fermat (a^{m-2}). Montgomery in/out. inv(0) = 0."""
    return pow_const(spec, a, spec.modulus - 2)


@_jit_spec
def batch_inv(spec: FieldSpec, a):
    """Batched inversion over the leading axis, TREE-structured.

    ``a``: [N, 16]. Cost: ~3N muls + one Fermat inversion, arranged as
    2*log2(N) FULL-WIDTH batched muls (product tree up, inverse tree down)
    instead of a 2N-step sequential ``lax.scan`` — the scan form runs N
    single-element muls back-to-back on device, which at N >= 2^18 is a
    multi-minute single program that trips the TPU runtime's watchdog and
    kills the worker (the round-3 "MSM bench crash" was this, via
    to_affine in the bench setup). Inverses are canonical field elements,
    so the result is bit-identical to the scan form.

    Entries equal to zero map to zero (matching arkworks' batch_inversion
    skip semantics).
    """
    n = a.shape[0]
    one = jnp.asarray(spec.one_mont)
    is_zero = jnp.all(a == 0, axis=-1)
    safe = _select(is_zero, jnp.broadcast_to(one, a.shape), a)
    if n == 0:
        return a
    m = 1 << max(0, (n - 1).bit_length())
    if m != n:
        safe = jnp.concatenate(
            [safe, jnp.broadcast_to(one, (m - n, NLIMBS))], axis=0)
    # up-sweep: pairwise product tree
    levels = [safe]
    cur = safe
    while cur.shape[0] > 1:
        cur = mul(spec, cur[0::2], cur[1::2])
        levels.append(cur)
    invs = inv(spec, cur)                       # [1, 16] root inverse
    # down-sweep: inv(l) = inv(parent) * r, inv(r) = inv(parent) * l
    for lvl in reversed(levels[:-1]):
        left, right = lvl[0::2], lvl[1::2]
        inv_left = mul(spec, invs, right)
        inv_right = mul(spec, invs, left)
        invs = jnp.stack([inv_left, inv_right], axis=1).reshape(-1, NLIMBS)
    return _select(is_zero, jnp.zeros_like(a), invs[:n])


@_jit_spec
def lazy_reduce(spec: FieldSpec, loose):
    """Reduce loose uint32 digit columns (value < 2^509) to a canonical element.

    Used for lazily-accumulated sums: add canonical elements digit-wise in
    uint32 (safe for up to 2^16 terms), then call this once. The represented
    value's residue mod m is preserved — domains (Montgomery or standard) pass
    through unchanged since reduction is linear.
    """
    k = loose.shape[-1]
    if k < 2 * NLIMBS:
        loose = jnp.concatenate(
            [loose, jnp.zeros(loose.shape[:-1] + (2 * NLIMBS - k,), dtype=U32)],
            axis=-1,
        )
    t, carry = _carry_canonicalize(loose[..., : 2 * NLIMBS], 2 * NLIMBS)
    del carry  # zero by the value-bound contract
    v = _redc(spec, t)  # value * R^{-1}
    return mul(spec, v, jnp.asarray(spec.r2_limbs))  # * R^2 * R^{-1} = value


@functools.partial(jax.jit, static_argnums=(0, 2))
def modsum(spec: FieldSpec, arr, axis: int = 0):
    """Modular sum of canonical elements along ``axis`` (not the limb axis).

    Hierarchical: digit-wise uint32 sums in blocks of 2^14 (safe: 16-bit
    digits can accumulate 2^16 terms), one lazy reduction per level.
    """
    arr = jnp.moveaxis(arr, axis, 0)
    chunk = 1 << 14
    while arr.shape[0] > 1:
        n = arr.shape[0]
        if n > chunk:
            nb = -(-n // chunk)
            pad = nb * chunk - n
            if pad:
                arr = jnp.concatenate(
                    [arr, jnp.zeros((pad,) + arr.shape[1:], dtype=U32)], axis=0
                )
            arr = arr.reshape(nb, chunk, *arr.shape[1:])
            arr = lazy_reduce(spec, jnp.sum(arr, axis=1))
        else:
            arr = lazy_reduce(spec, jnp.sum(arr, axis=0))[None]
    return arr[0]


@functools.partial(jax.jit, static_argnums=(0, 3))
def segment_modsum(spec: FieldSpec, values, segment_ids, num_segments: int):
    """Modular segment sum: out[s] = sum of values[i] with segment_ids[i]==s.

    ``values``: [n, 16] canonical; at most 2^16 members per segment.
    TPU-native replacement for the reference's per-row sparse accumulation
    loops (noir-r1cs/src/r1cs.rs sparse_dot / co-spartan worker zero_round).
    """
    loose = jax.ops.segment_sum(
        values, segment_ids, num_segments=num_segments
    )  # [S, 16] u32 digit-wise sums
    return lazy_reduce(spec, loose)


# ---------------------------------------------------------------------------
# Host conversions
# ---------------------------------------------------------------------------


def from_int(spec: FieldSpec, values, mont: bool = True):
    """Python ints / iterable of ints -> device limb array (Montgomery form)."""
    if isinstance(values, (int, np.integer)):
        arr = int_to_limbs(int(values) % spec.modulus)
    else:
        vs = [int(v) % spec.modulus for v in np.asarray(values, dtype=object).ravel()]
        arr = np.stack([int_to_limbs(v) for v in vs]).reshape(
            tuple(np.shape(values)) + (NLIMBS,)
        )
    out = jnp.asarray(arr)
    return to_mont(spec, out) if mont else out


def to_int(spec: FieldSpec, limbs, mont: bool = True):
    """Device limb array -> numpy object array of Python ints (host-side)."""
    if mont:
        limbs = from_mont(spec, limbs)
    arr = np.asarray(limbs)
    flat = arr.reshape(-1, NLIMBS)
    ints = np.array([limbs_to_int(row) for row in flat], dtype=object)
    if arr.ndim == 1:
        return ints[0]
    return ints.reshape(arr.shape[:-1])


def zeros(shape=()):
    return jnp.zeros(tuple(shape) + (NLIMBS,), dtype=U32)


def ones_mont(spec: FieldSpec, shape=()):
    return jnp.broadcast_to(jnp.asarray(spec.one_mont), tuple(shape) + (NLIMBS,)).copy()


def eq_mask(a, b):
    """Elementwise equality of field elements -> bool over batch shape."""
    return jnp.all(a == b, axis=-1)


# ---------------------------------------------------------------------------
# Random elements (for masks / testing) — uniform via rejection-free wide
# reduction of 512 random bits with Montgomery folding.
# ---------------------------------------------------------------------------


def random(spec: FieldSpec, key, shape=(), mont: bool = True):
    """Uniform field elements from a jax PRNG key.

    Draws 2*NLIMBS random 16-bit digits x (< R^2-ish) and computes
    REDC(x) = x * R^{-1} mod m; for x uniform in [0, R^2) the bias is
    negligible (~2^-190 for BN254). With ``mont=True`` the output is then the
    Montgomery form of a (different) uniform value — still uniform.
    """
    bits = jax.random.bits(key, tuple(shape) + (2 * NLIMBS,), dtype=jnp.uint32)
    digits = bits & MASK
    # cap to 508 bits so T < m*R holds for REDC's "< 2m" output bound
    digits = digits.at[..., -1].set(digits[..., -1] & 0xFFF)
    red = _redc(spec, digits)  # uniform standard-domain value
    return to_mont(spec, red) if mont else red
