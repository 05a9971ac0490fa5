"""Rep3 MPC protocol ops over the party axis (degree-2 mul, open, reshare).

Maps mpc-core's protocol runtime (SURVEY.md §2.2): ``product`` /
``mul_vec`` / ``reshare_additive`` / ``open_vec`` become fixed array programs
over the leading size-3 party axis. Communication is implicit: with the party
axis sharded on a 3-wide mesh axis, ``jnp.roll(axis=0)`` IS the reshare ring
(one ICI permute) and the party-sum of ``open`` IS the star gather.

Local share algebra (rep3/arithmetic/ops.rs:71-109): party p holds
(a_p, b_p = a_{p-1}); x*y has additive share
d_p = xa*ya + xa*yb + xb*ya  (+ zero-share mask for re-randomization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops.field import FieldSpec
from . import comm
from . import shares as S


@functools.partial(jax.jit, static_argnums=0)
def _mul_impl(spec: FieldSpec, x, y, zero_mask=None):
    xb = S.b_component(x)
    yb = S.b_component(y)
    d = F.add(
        spec,
        F.mul(spec, x, y),
        F.add(spec, F.mul(spec, x, yb), F.mul(spec, xb, y)),
    )
    if zero_mask is not None:
        d = F.add(spec, d, zero_mask)
    return d


def mul(spec: FieldSpec, x, y, zero_mask=None):
    """Share-by-share product -> additive (= replicated after implicit reshare).

    ``x``, ``y``: [3, ..., 16] share stacks. ``zero_mask``: optional
    correlated zero shares [3, ..., 16] (security re-randomization; required
    in a real deployment, optional for in-process simulation/tests).

    Comm accounting fires at call time (outside the jitted body) so volumes
    are recorded even when the compiled program is cache-hit.
    """
    comm.record_reshare(x.shape[1:])
    return _mul_impl(spec, x, y, zero_mask)


@functools.partial(jax.jit, static_argnums=0)
def mul_public(spec: FieldSpec, x, c):
    """Multiply shares by a public value (local)."""
    return F.mul(spec, x, c[None] if c.ndim == x.ndim - 1 else c)


@functools.partial(jax.jit, static_argnums=0)
def add_public(spec: FieldSpec, x, c):
    """Add a public value: only party 0 applies it (additive.rs:15-25)."""
    p0 = F.add(spec, x[0], c)
    return jnp.concatenate([p0[None], x[1:]], axis=0)


def open(spec: FieldSpec, x):
    """Reconstruct the public value from shares (sum over party axis)."""
    return S.combine(spec, x)


@functools.partial(jax.jit, static_argnums=0)
def inner_product(spec: FieldSpec, x, y_public):
    """<shares, public vector> along the element axis -> shares of scalar."""
    prods = F.mul(spec, x, y_public[None])
    return F.modsum(spec, prods, axis=1)


@functools.partial(jax.jit, static_argnums=0)
def eval_shares(spec: FieldSpec, stack, point):
    """MLE evaluation computed SHARE-SIDE: each party binds its own [n, 16]
    share table at ``point`` (binding is linear, so the bound shares still
    sum to the true evaluation); only the final [3, 16] scalar stack is
    returned for opening. This is the sound replacement for
    combine-then-evaluate, which would materialize the secret polynomial
    (maps rep3_eval_poly_coordinator, co-spartan/src/coordinator.rs:837-866).
    """
    from ..ops import poly as P

    return jax.vmap(lambda t: P.evaluate(spec, t, point))(stack)


def eval_open(spec: FieldSpec, stack, point) -> int:
    """Share-side evaluation + opening of the scalar only."""
    vals = eval_shares(spec, stack, point)          # [3, 16]
    opened = S.combine(spec, vals)
    return int(F.to_int(spec, opened))
