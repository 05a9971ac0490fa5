"""Dense multilinear extensions (MLEs) as limb arrays on the hypercube.

An MLE over nv variables is its evaluation table ``[2^nv, 16]`` (uint32
limbs, Montgomery form). Index bit k (LSB = bit 0) corresponds to variable
x_k, matching arkworks ``DenseMultilinearExtension`` semantics so protocol
round ordering lines up with the reference
(mpc-core/src/protocols/rep3/poly.rs Rep3DensePolynomial, co-jolt
poly/multilinear_polynomial.rs).

Key ops: eq tables (incl. the chunk-local partial eq used by distributed
sumcheck — spartan/src/utils.rs partial_generate_eq), variable binding
(sumcheck round fold), evaluation, chunk split/merge along the high variables
(the reference's split_poly worker sharding = our mesh "chunk" axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import field as F
from .field import FR, FieldSpec


def num_vars(table) -> int:
    n = table.shape[-2]
    nv = n.bit_length() - 1
    assert 1 << nv == n, "table length must be a power of two"
    return nv


@functools.partial(jax.jit, static_argnums=0)
def eq_table(spec: FieldSpec, r):
    """eq(r, x) table over the full hypercube: [2^nv, 16].

    eq[j] = prod_k (r_k if bit_k(j) else 1 - r_k). ``r``: [nv, 16] Montgomery.
    """
    nv = r.shape[0]
    one = F.ones_mont(spec, (1,))
    table = one
    for k in range(nv):
        rk = r[k : k + 1]
        lo = F.mul(spec, table, F.sub(spec, jnp.broadcast_to(one, table.shape), jnp.broadcast_to(rk, table.shape)))
        hi = F.mul(spec, table, jnp.broadcast_to(rk, table.shape))
        table = jnp.concatenate([lo, hi], axis=0)
    return table


@functools.partial(jax.jit, static_argnums=0)
def bind_low(spec: FieldSpec, table, r):
    """Bind variable x_0 (the LSB of the index) to r: halves the table.

    out[j] = t[2j] + r * (t[2j+1] - t[2j])  — the sumcheck round fold.
    """
    even = table[0::2]
    odd = table[1::2]
    diff = F.sub(spec, odd, even)
    return F.add(spec, even, F.mul(spec, jnp.broadcast_to(r, diff.shape), diff))


@functools.partial(jax.jit, static_argnums=0)
def bind_high(spec: FieldSpec, table, r):
    """Bind the top variable (MSB of the index) to r: halves the table."""
    half = table.shape[0] // 2
    lo = table[:half]
    hi = table[half:]
    diff = F.sub(spec, hi, lo)
    return F.add(spec, lo, F.mul(spec, jnp.broadcast_to(r, diff.shape), diff))


def evaluate(spec: FieldSpec, table, point):
    """Evaluate the MLE at ``point`` [nv, 16] (binds x_0 first). Returns [16]."""
    nv = num_vars(table)
    assert point.shape[0] == nv
    for k in range(nv):
        table = bind_low(spec, table, point[k])
    return table[0]


@functools.partial(jax.jit, static_argnums=0)
def evaluate_jit(spec: FieldSpec, table, point):
    return evaluate(spec, table, point)


def split_chunks(table, n_chunks: int):
    """Split along the HIGH variables into contiguous chunks [n_chunks, L, 16].

    Matches the reference's worker sharding (co-spartan/src/utils.rs:9-35
    split_poly): worker w owns indices [w*L, (w+1)*L).
    """
    n = table.shape[0]
    assert n % n_chunks == 0
    return table.reshape(n_chunks, n // n_chunks, F.NLIMBS)


def merge_chunks(chunks):
    """Inverse of split_chunks."""
    return chunks.reshape(-1, F.NLIMBS)


@functools.partial(jax.jit, static_argnums=0)
def linear_combination(spec: FieldSpec, coeffs, tables):
    """sum_i coeffs[i] * tables[i]: ([k,16], [k,n,16]) -> [n,16]."""
    prods = F.mul(spec, coeffs[:, None, :], tables)
    acc = prods[0]
    for i in range(1, prods.shape[0]):
        acc = F.add(spec, acc, prods[i])
    return acc


def eq_eval(spec: FieldSpec, r, s):
    """eq(r, s) for two points [nv, 16] -> [16].

    eq = prod_k (r_k s_k + (1-r_k)(1-s_k)).
    """
    one = F.ones_mont(spec, (r.shape[0],))
    term = F.add(
        spec,
        F.mul(spec, r, s),
        F.mul(spec, F.sub(spec, one, r), F.sub(spec, one, s)),
    )
    acc = term[0]
    for k in range(1, term.shape[0]):
        acc = F.mul(spec, acc, term[k])
    return acc


def from_ints(values, spec: FieldSpec = FR):
    """List of ints -> MLE table (pads to the next power of two with zeros)."""
    n = len(values)
    nv = max(1, (n - 1).bit_length())
    padded = list(values) + [0] * ((1 << nv) - n)
    return F.from_int(spec, padded)


def pad_to_pow2(table, nv: int = None):
    """Zero-pad an eval table to 2^nv rows (default: next power of two)."""
    n = table.shape[0]
    if nv is None:
        nv = max(1, (n - 1).bit_length())
    target = 1 << nv
    if n == target:
        return table
    pad = jnp.zeros((target - n, F.NLIMBS), dtype=jnp.uint32)
    return jnp.concatenate([table, pad], axis=0)
