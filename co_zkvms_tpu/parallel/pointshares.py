"""Rep3 EC point shares: G1 points secret-shared over the party axis.

Maps mpc-types' ``Rep3PointShare`` (rep3/pointshare/types.rs:15-22): a point
P is held as three group-additive shares P = R0 + R1 + R2, each party
holding (R_p, R_{p-1}). TPU-first layout: the party axis is the leading
batch axis of a Jacobian point batch — [3] + batch — so every local
operation (add, mixed add, public scalar mul) is the existing batched curve
kernel applied across parties at once, and combining is a 2-add tree along
axis 0 (one `psum`-like fold on a party-sharded mesh).

Used by the PCS layer: per-party PST13 commitment MSMs ARE point shares of
the value's commitment (commit(sum shares) = sum commit(share)); this module
gives them a first-class device type so merges need no host round-trip."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import curve as C
from ..ops import field as F
from ..ops.field import FQ, FR
from ..ops.curve import JPoint


def share(key, p: JPoint) -> JPoint:
    """Split a Jacobian point batch into 3 additive group shares:
    [3] + batch. Randomizers are uniform multiples of the generator."""
    from ..ops import msm as M
    from ..ops import ref_bn254 as bn

    shape = p.x.shape[:-1]
    n = 1
    for d in shape:
        n *= int(d)
    k0, k1 = jax.random.split(key)
    g = C.points_from_ints([bn.g1_coords(bn.G1_GEN)])
    g1 = C.APoint(g.x[0], g.y[0])
    r0 = M.fixed_base_msm(g1, F.random(FR, k0, (n,)))
    r1 = M.fixed_base_msm(g1, F.random(FR, k1, (n,)))
    r0 = jax.tree.map(lambda a: a.reshape(shape + (F.NLIMBS,)), r0)
    r1 = jax.tree.map(lambda a: a.reshape(shape + (F.NLIMBS,)), r1)
    r2 = C.add(p, C.add(neg(r0), neg(r1)))
    return JPoint(
        jnp.stack([r0.x, r1.x, r2.x]),
        jnp.stack([r0.y, r1.y, r2.y]),
        jnp.stack([r0.z, r1.z, r2.z]),
    )


def neg(p: JPoint) -> JPoint:
    """-(x, y, z) = (x, -y, z) — coordinates are base-field (FQ) elements."""
    zero = jnp.zeros_like(p.y)
    return JPoint(p.x, F.sub(FQ, zero, p.y), p.z)


def combine(stack: JPoint) -> JPoint:
    """Reconstruct: sum the three party shares (batched adds)."""
    p0 = jax.tree.map(lambda a: a[0], stack)
    p1 = jax.tree.map(lambda a: a[1], stack)
    p2 = jax.tree.map(lambda a: a[2], stack)
    return C.add(C.add(p0, p1), p2)


def add(x: JPoint, y: JPoint) -> JPoint:
    """Share + share: party-local batched Jacobian add (no communication —
    pointshare ops are linear)."""
    return C.add(x, y)


def add_public(stack: JPoint, p: JPoint) -> JPoint:
    """Share + public point: party 0 only (the additive constant
    convention, additive.rs:15-25)."""
    p0 = jax.tree.map(lambda a: a[0], stack)
    s0 = C.add(p0, p)
    return JPoint(
        stack.x.at[0].set(s0.x),
        stack.y.at[0].set(s0.y),
        stack.z.at[0].set(s0.z),
    )


def msm_shares(srs_level, coeff_stack) -> JPoint:
    """Point shares of commit(value) from Rep3 coefficient shares: one MSM
    per party over the same bases (commit is linear, so the per-party MSM
    results ARE a Rep3PointShare of the value's commitment). [3] batch."""
    from ..ops import msm as M

    outs = [M.msm(srs_level, coeff_stack[p]) for p in range(3)]
    return JPoint(
        jnp.concatenate([o.x for o in outs]),
        jnp.concatenate([o.y for o in outs]),
        jnp.concatenate([o.z for o in outs]),
    )
