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
