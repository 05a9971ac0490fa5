"""Correlated randomness for Rep3: 3-party zero shares from paired seeds.

Maps the reference's ``SSRandom`` (mpc-core/src/protocols/rep3/rngs.rs:11-38)
and ``get_mask_scalar_*`` (rep3/arithmetic.rs:39-48): party p holds seed s_p
(shared with its next neighbor) and s_{p-1} (shared with its prev neighbor);
``zero = PRF(s_p, ctr) - PRF(s_{p-1}, ctr)`` sums to zero over the 3 parties.

Here the PRF is JAX's counter-based threefry keyed per (party, counter) —
generated on-device with no streaming, and identical regardless of whether
the party axis is local or sharded (each party's slice derives only from its
own two seeds).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops.field import FieldSpec


class CorrelatedRng(NamedTuple):
    """Per-party-pair seeds; ``key_data`` has shape [3, *keyshape]."""

    key_data: jax.Array

    @classmethod
    def create(cls, master_key):
        keys = jax.random.split(master_key, 3)
        return cls(jax.vmap(jax.random.key_data)(keys))

    def zero_shares(self, spec: FieldSpec, counter: int, shape=()):
        """Zero-sum shares [3, *shape, 16]: party p gets F(s_p) - F(s_{p-1})."""

        def gen(kd):
            k = jax.random.fold_in(jax.random.wrap_key_data(kd), counter)
            return F.random(spec, k, shape)

        r = jax.vmap(gen)(self.key_data)  # [3, *shape, 16] — r[p] = PRF(s_p)
        r_prev = jnp.roll(r, 1, axis=0)  # party p's copy of PRF(s_{p-1})
        return F.sub(spec, r, r_prev)


def zero_shares_from_keys(spec: FieldSpec, key_data, shape, *counters):
    """Trace-compatible zero-sum shares from raw ``key_data`` [3, K].

    Same construction as ``CorrelatedRng.zero_shares`` but usable INSIDE a
    jitted kernel with traced counters (e.g. a per-round counter passed as a
    runtime argument plus a scanned term index) — the fresh-randomness source
    for mul-chain resharing inside compiled sumcheck rounds, where a
    host-side counter would bake one constant mask per compiled shape."""

    def gen(kd):
        k = jax.random.wrap_key_data(kd)
        for ctr in counters:
            k = jax.random.fold_in(k, ctr)
        return F.random(spec, k, shape)

    r = jax.vmap(gen)(key_data)
    return F.sub(spec, r, jnp.roll(r, 1, axis=0))
