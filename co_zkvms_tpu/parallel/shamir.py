"""Shamir t-of-n secret sharing over Fr (vectorized on device).

Maps mpc-types' shamir module (shamir.rs:20-432: share, reconstruct,
lagrange_from_coeff, interpolate_poly_from_precomputed). Shares of a vector
of secrets are evaluated/batched on device; Lagrange coefficients are small
host-side scalars (party ids are public).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops.field import FR, FieldSpec

MOD = FR.modulus


def share(spec: FieldSpec, key, secret, t: int, n: int):
    """Degree-t polynomial sharing: returns [n, ..., 16] (party i gets x=i+1)."""
    coeffs = [secret] + [
        F.random(spec, k, secret.shape[:-1])
        for k in jax.random.split(key, t)
    ]
    out = []
    for i in range(1, n + 1):
        # Horner at x = i (public small scalar)
        acc = coeffs[-1]
        for c in reversed(coeffs[:-1]):
            acc = F.add(spec, F.mul_small(spec, acc, i), c)
        out.append(acc)
    return jnp.stack(out)


def lagrange_at_zero(ids):
    """Lagrange coefficients lambda_i with sum lambda_i * f(id_i) = f(0)."""
    lams = []
    for i in ids:
        num, den = 1, 1
        for j in ids:
            if j == i:
                continue
            num = num * (-j) % MOD
            den = den * (i - j) % MOD
        lams.append(num * pow(den, -1, MOD) % MOD)
    return lams


def reconstruct(spec: FieldSpec, shares, ids):
    """Reconstruct from any t+1 shares. ``shares``: [k, ..., 16]; ids 1-based."""
    lams = lagrange_at_zero(list(ids))
    acc = None
    for lam, sh in zip(lams, shares):
        term = F.mul(spec, F.from_int(spec, lam), sh)
        acc = term if acc is None else F.add(spec, acc, term)
    return acc


# --- precomputed Lagrange machinery ------------------------------------------
# Maps shamir.rs's lagrange_from_coeff / interpolate_poly_from_precomputed:
# the coefficient set for a fixed party subset is computed once (host ints),
# pushed to the device in Montgomery form, and every subsequent reconstruct
# is ONE batched mul + a 2-add fold — the hot path never recomputes
# inversions.


def lagrange_at(ids, x: int):
    """Lagrange coefficients for evaluating f(x) from shares at ``ids``."""
    lams = []
    for i in ids:
        num, den = 1, 1
        for j in ids:
            if j == i:
                continue
            num = num * (x - j) % MOD
            den = den * (i - j) % MOD
        lams.append(num * pow(den, -1, MOD) % MOD)
    return lams


def precompute_lagrange(ids, x: int = 0):
    """Device [k, 16] Montgomery Lagrange coefficients for a party subset."""
    return F.from_int(FR, lagrange_at(list(ids), x))


def reconstruct_precomputed(spec: FieldSpec, shares, lams_dev):
    """f(x) from shares [k, ..., 16] with precomputed coefficients: one
    batched mul + log-k adds (interpolate_poly_from_precomputed parity)."""
    extra = shares.ndim - lams_dev.ndim
    lam = lams_dev.reshape(lams_dev.shape[:1] + (1,) * extra + (16,))
    prods = F.mul(spec, shares, lam)
    return F.modsum(spec, prods, axis=0)


def interpolate_poly(spec: FieldSpec, shares, ids, xs):
    """Evaluate the sharing polynomial at several public points ``xs`` —
    the building block the reference uses to re-share to a different party
    set (shamir.rs interpolation helpers)."""
    return jnp.stack([
        reconstruct_precomputed(spec, shares, precompute_lagrange(ids, x))
        for x in xs
    ])


# --- Shamir point shares ------------------------------------------------------
# Maps mpc-types' shamir/pointshare: shares are group elements S_i =
# P + sum_k i^k * C_k with random point coefficients C_k; reconstruction is
# sum lambda_i * S_i. TPU-first: the share index is the leading batch axis
# of a Jacobian point batch, scalar multiplications are one lax.scan
# double-and-add over the 254 scalar bits, batched across the whole fleet.


def _scalar_bits_dev(k_int: int):
    bits = [(k_int >> i) & 1 for i in range(254)]
    return jnp.asarray(bits[::-1], dtype=jnp.uint32)  # MSB first


def scalar_mul_public(p, k_int: int):
    """k * P for a public host-int scalar; ``p``: JPoint batch."""
    from ..ops import curve as C

    bits = _scalar_bits_dev(k_int % MOD)

    def step(acc, b):
        acc = C.double(acc)
        added = C.add(acc, p)
        take = (b == 1)
        acc = jax.tree.map(
            lambda a, d: jnp.where(
                jnp.broadcast_to(take, a.shape), d, a), acc, added)
        return acc, None

    acc, _ = jax.lax.scan(step, C.infinity(p.x.shape[:-1]), bits)
    return acc


def share_point(key, p, t: int, n: int):
    """Degree-t point sharing: JPoint with leading axis n (party i at x=i+1).

    Coefficient points are r_k * G for on-device-sampled scalars r_k
    (uniform group elements; G is the BN254 generator)."""
    from ..ops import curve as C
    from ..ops import msm as M
    from ..ops import ref_bn254 as bn

    g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
    g1 = C.APoint(g.x[0], g.y[0])
    batch = p.x.shape[:-1]
    nb = 1
    for d in batch:
        nb *= d
    rs = F.random(FR, key, (t * max(nb, 1),))
    cs = M.fixed_base_msm(g1, rs)           # [t*nb] JPoint
    coeffs = C.JPoint(
        cs.x.reshape((t,) + batch + (16,)),
        cs.y.reshape((t,) + batch + (16,)),
        cs.z.reshape((t,) + batch + (16,)),
    )
    out = []
    for i in range(1, n + 1):
        acc = p
        for k in range(1, t + 1):
            ck = jax.tree.map(lambda a, k=k: a[k - 1], coeffs)
            acc = C.add(acc, scalar_mul_public(ck, pow(i, k)))
        out.append(acc)
    return C.JPoint(
        jnp.stack([o.x for o in out]),
        jnp.stack([o.y for o in out]),
        jnp.stack([o.z for o in out]),
    )


def reconstruct_point(shares, ids, x: int = 0):
    """f(x) from point shares (leading axis = subset index, same order as
    ``ids``): sum lambda_i * S_i."""
    from ..ops import curve as C

    lams = lagrange_at(list(ids), x)
    acc = None
    for idx, lam in enumerate(lams):
        s_i = jax.tree.map(lambda a, idx=idx: a[idx], shares)
        term = scalar_mul_public(s_i, lam)
        acc = term if acc is None else C.add(acc, term)
    return acc
