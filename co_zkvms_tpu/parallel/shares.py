"""Replicated (Rep3) / additive secret shares as arrays with a party axis.

Design (TPU-first re-expression of mpc-types — SURVEY.md §2.1): a shared
vector of N field elements is ONE array ``[3, N, 16]`` whose leading axis is
the party axis. Party p's additive share is ``A[p]``; its replicated pair is
``(A[p], A[p-1])`` — the "b" component is never materialized, it is
``jnp.roll(A, 1, axis=0)`` (locally) or a ring permute (when the party axis
is sharded onto a size-3 mesh axis). This collapses the reference's
``Rep3PrimeFieldShare{a,b}`` (rep3/arithmetic/types.rs:22-29) into layout.

Sharding story: place the party axis on a mesh axis of size 3 and the element
axis on a "chunk" axis; all protocol code is global-view jnp, XLA inserts the
ring collectives (the reference's mpc-net worker ring) automatically.

Also provides seeded share compression (maps mpc-types rep3.rs:34-174
``SeededType``/``ReplicatedSeedType``): two of the three shares are expanded
from PRNG keys on-device, so distributing a witness costs one share + two
32-byte keys instead of three full vectors — this removes the reference's
297 s witness-streaming bottleneck (BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops.field import FR, FieldSpec


def share(spec: FieldSpec, key, secret):
    """Split ``secret`` [..., 16] into additive shares [3, ..., 16]."""
    k0, k1 = jax.random.split(key)
    r0 = F.random(spec, k0, secret.shape[:-1])
    r1 = F.random(spec, k1, secret.shape[:-1])
    r2 = F.sub(spec, F.sub(spec, secret, r0), r1)
    return jnp.stack([r0, r1, r2], axis=0)


def share_seeded(spec: FieldSpec, key, secret):
    """Seeded sharing: returns (keys [2], explicit_share_2).

    Shares 0 and 1 are PRNG-expanded from the keys (see ``expand_seeded``);
    only share 2 is explicit. combine(expand_seeded(...)) == secret.
    """
    k0, k1 = jax.random.split(key)
    r0 = F.random(spec, k0, secret.shape[:-1])
    r1 = F.random(spec, k1, secret.shape[:-1])
    r2 = F.sub(spec, F.sub(spec, secret, r0), r1)
    return jnp.stack([jax.random.key_data(k0), jax.random.key_data(k1)]), r2


def expand_seeded(spec: FieldSpec, key_data, explicit_share, shape):
    """Rebuild full share stack [3, ..., 16] from two keys + explicit share."""
    r0 = F.random(spec, jax.random.wrap_key_data(key_data[0]), shape)
    r1 = F.random(spec, jax.random.wrap_key_data(key_data[1]), shape)
    return jnp.stack([r0, r1, explicit_share], axis=0)


@functools.partial(jax.jit, static_argnums=0)
def _combine_impl(spec: FieldSpec, shares):
    acc = shares[0]
    for p in range(1, shares.shape[0]):
        acc = F.add(spec, acc, shares[p])
    return acc


def combine(spec: FieldSpec, shares):
    """Reconstruct the secret: modular sum over the party axis (axis 0).

    Comm accounting fires at call time (not trace time) so cache-hit
    compiled programs still count."""
    from . import comm

    comm.record_open(shares.shape[1:])
    return _combine_impl(spec, shares)


def promote_public(spec: FieldSpec, value):
    """Trivial sharing of a public value: party 0 holds it, others hold 0.

    Matches the reference's convention that only party 0 applies public
    constants (mpc-core/src/protocols/additive.rs:15-25).
    """
    zeros = jnp.zeros((2,) + value.shape, dtype=value.dtype)
    return jnp.concatenate([value[None], zeros], axis=0)


def b_component(shares):
    """The replicated "b" share: party p's copy of party p-1's share.

    Locally a roll; under a party-sharded mesh XLA lowers this to the
    3-cycle collective permute (the reference's prev->next reshare ring,
    mpc-core rep3/arithmetic.rs:144-164).
    """
    return jnp.roll(shares, 1, axis=0)
