"""Batched dense grand products via GKR (Thaler13), public or Rep3-shared.

Maps co-jolt's ``Rep3BatchedDenseGrandProduct``
(subprotocols/grand_product.rs:220-309) and its per-layer cubic sumcheck
(poly/dense_interleaved_poly.rs) — the innermost MPC kernel of Jolt memory
checking (SURVEY.md §3.5). TPU-first re-design:

- layer tables are [B, 2^k, 16] arrays (batch, element, limb); a layer
  product is ONE vectorized share-mul (for Rep3: one implicit reshare — the
  reference's "one ring message per layer");
- layer k proves  V_{k-1}(r) = sum_x eq(r, x) * V_k(0,x) * V_k(1,x) with a
  degree-3 batched sumcheck, instances RLC'd by transcript coefficients;
- after each layer the prover opens per-instance claims L_b, R_b and the
  verifier folds  C_b <- L_b + mu * (R_b - L_b)  at point (mu, rho).

The caller ties the final leaf-layer claims to committed polynomials.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import field as F
from . import poly as P
from . import sumcheck as SC
from . import transcript as T
from .field import FR
from ..parallel import mpc, shares as Sh

MOD = FR.modulus


class GrandProductProof(NamedTuple):
    products: list              # [B] ints — the claimed products
    layer_msgs: list            # per layer: [rounds][4] ints (empty for layer 1)
    layer_claims: list          # per layer: ([L_b ints], [R_b ints])


def _comb_gkr(polys, consts):
    eq, left, right = polys
    (coeffs,) = consts
    prod = F.mul(FR, left, right)
    mix = F.mul(FR, prod, coeffs[:, None, :])
    acc = F.modsum(FR, mix, 0)          # reduce over instances
    return F.mul(FR, eq, acc)


def _comb_gkr_shared(polys, consts, chunk_i, t_idx):
    """Shared GKR comb ([3, B, h, 16] stacks) with a FRESH correlated zero
    share on every in-round share-mul (mask-on-every-reshare,
    rep3/arithmetic.rs:39-48): the mask is derived in-kernel per
    (round, chunk, t) so one compiled program still serves all rounds."""
    from ..parallel.rng import zero_shares_from_keys

    eq, left, right = polys
    coeffs, key_data, rctr = consts
    mask = zero_shares_from_keys(FR, key_data, left.shape[1:-1],
                                 rctr, chunk_i, t_idx)
    prod = mpc.mul(FR, left, right, zero_mask=mask)
    mix = F.mul(FR, prod, coeffs[None, :, None, :])
    acc = F.modsum(FR, mix, 1)          # reduce over instances -> [3, h, 16]
    return F.mul(FR, eq, acc)


_comb_gkr_shared.wants_ctr = True


def compute_layers(leaves, shared: bool = False, masks_rng=None,
                   mask_base: int = 0):
    """All GKR layers bottom-up. leaves: [B, N, 16] or [3, B, N, 16].

    Shared layer products are re-randomized with correlated zero shares when
    ``masks_rng`` is given: the product output is the additive share that a
    real 3-party deployment reshares over the ring (one message per layer —
    rep3/arithmetic.rs:51-105), so it must carry fresh randomness before the
    next layer takes its b-component."""
    layers = [leaves]
    cur = leaves
    lk = 0
    while cur.shape[-2] > 1:
        even = cur[..., 0::2, :]
        odd = cur[..., 1::2, :]
        if shared:
            mask = None
            if masks_rng is not None:
                mask = masks_rng.zero_shares(
                    FR, mask_base + 31 * lk + 17, even.shape[1:-1])
            cur = mpc.mul(FR, even, odd, zero_mask=mask)
        else:
            cur = F.mul(FR, even, odd)
        layers.append(cur)
        lk += 1
    return layers


def _open(x, shared):
    return Sh.combine(FR, x) if shared else x


def _to_ints(arr):
    import numpy as np

    vals = np.atleast_1d(F.to_int(FR, arr))
    return [int(v) for v in vals.reshape(-1)]


def prove_batched(state, leaves, shared: bool = False, masks_rng=None,
                  mask_base: int = 0):
    """Prove the B grand products of ``leaves``.

    Returns (state', proof, final_point [n,16], final_claims device [B,16]).
    ``leaves``: [B, N, 16] (public) or [3, B, N, 16] (Rep3 share stacks).
    """
    layers = compute_layers(leaves, shared, masks_rng=masks_rng,
                            mask_base=mask_base + 50000)
    b = leaves.shape[-3]
    n_layers = len(layers) - 1

    products = _open(layers[-1], shared)[..., 0, :]  # [B, 16]
    state = T.absorb_fes(FR, state, products)
    product_ints = _to_ints(products)

    layer_msgs = []
    layer_claims = []
    claims = products                    # [B, 16] device
    point = jnp.zeros((0, F.NLIMBS), dtype=jnp.uint32)

    for k in range(1, n_layers + 1):
        layer = layers[n_layers - k]     # [.., B, 2^k, 16]
        left = layer[..., 0::2, :]
        right = layer[..., 1::2, :]
        if k == 1:
            msgs = []
        else:
            state, coeff_chal = T.challenge_fe(state)
            coeffs = _powers(coeff_chal, b)
            nrounds = k - 1
            masks = None
            round_consts = None
            if shared:
                masks = jnp.stack([
                    masks_rng.zero_shares(FR, mask_base + 97 * k + j, (4,))
                    for j in range(nrounds)
                ])
                round_consts = [
                    (masks_rng.key_data,
                     jnp.uint32(mask_base + 770_000 + 97 * k + j))
                    for j in range(nrounds)
                ]
            res = SC.prove(
                FR, state, [left, right], degree=3,
                comb=_comb_gkr_shared if shared else _comb_gkr,
                consts=(coeffs,), masks=masks, shared=shared,
                round_consts=round_consts, eq_split=point,
            )
            state = res.state
            msgs = SC.round_msgs_to_ints(res.round_msgs)
            left, right = res.final_polys[0], res.final_polys[1]
            point = res.challenges
        l_vals = _open(left, shared)[..., 0, :]   # [B, 16]
        r_vals = _open(right, shared)[..., 0, :]
        state = T.absorb_fes(FR, state, l_vals)
        state = T.absorb_fes(FR, state, r_vals)
        layer_msgs.append(msgs)
        layer_claims.append((_to_ints(l_vals), _to_ints(r_vals)))
        state, mu = T.challenge_fe(state)
        claims = F.add(FR, l_vals, F.mul(FR, jnp.broadcast_to(mu, r_vals.shape),
                                         F.sub(FR, r_vals, l_vals)))
        point = jnp.concatenate([mu[None], point], axis=0)

    proof = GrandProductProof(
        products=product_ints, layer_msgs=layer_msgs, layer_claims=layer_claims
    )
    return state, proof, point, claims


def _powers(x, n):
    out = [F.ones_mont(FR)]
    for _ in range(n - 1):
        out.append(F.mul(FR, out[-1], x))
    return jnp.stack(out)


# --- toggled (sparse) grand products ----------------------------------------
#
# Maps co-jolt's Rep3ToggledBatchedGrandProduct
# (subprotocols/sparse_grand_product.rs:76-919): instance b's leaves are
# flag-toggled fingerprints  E_b(x) = f_b(x) * fp_b(x) + 1 - f_b(x), so
# un-flagged steps contribute a multiplicative 1. The reference exploits the
# sparsity with CPU sparse-interleaved layers; on TPU the leaves are ONE
# fused vectorized op and the dense GKR kernels run at HBM bandwidth —
# gather-based nnz compression would be slower until density < ~1/50 (VPU
# ops are ~free relative to irregular HBM gathers), so the sparse win is
# realized as work saved in the *claims*, not the layout.
#
# What the verifier gains is identical to the reference: the GKR bottom
# claim is reduced by ONE extra degree-3 sumcheck
#     E(r) = sum_x eq(r, x) * (f(x) * fp(x) + 1 - f(x))
# to claims on the COMMITTED fp polynomials and the public flags — E itself
# is never committed or opened (sparse_grand_product.rs:304-919's final
# layers play this role).


class ToggledProof(NamedTuple):
    gp: GrandProductProof
    leaf_msgs: list             # [rounds][4] ints — leaf-reduction sumcheck
    fp_claims: list             # [B] ints — fingerprint evals at final point
    flag_claims: list           # [B] ints — flag evals (public, checkable)


def _comb_toggled(polys, consts):
    eq, flags, fps = polys
    (coeffs,) = consts
    one = F.ones_mont(FR)
    e = F.add(FR, F.mul(FR, flags, fps),
              F.sub(FR, jnp.broadcast_to(one, flags.shape), flags))
    mix = F.mul(FR, e, coeffs[:, None, :])
    return F.mul(FR, eq, F.modsum(FR, mix, 0))


def _comb_toggled_shared(polys, consts):
    eq, flags, fps = polys              # flags/eq public, fps [3, B, h, 16]
    (coeffs,) = consts
    one = F.ones_mont(FR)
    e = F.mul(FR, flags[None], fps)     # public x shared: local
    pub = F.sub(FR, jnp.broadcast_to(one, flags.shape), flags)
    e = mpc.add_public(FR, e, pub)
    mix = F.mul(FR, e, coeffs[None, :, None, :])
    return F.mul(FR, eq[None], F.modsum(FR, mix, 1))


def toggled_leaves(flags, fps, shared: bool = False):
    """E = f * fp + 1 - f. ``flags``: public [B, N, 16]; ``fps``: [B, N, 16]
    or [3, B, N, 16]."""
    one = F.ones_mont(FR)
    pub = F.sub(FR, jnp.broadcast_to(one, flags.shape), flags)
    if shared:
        return mpc.add_public(FR, F.mul(FR, flags[None], fps), pub)
    return F.add(FR, F.mul(FR, flags, fps), pub)


def prove_toggled(state, flags, fps, shared: bool = False, masks_rng=None,
                  mask_base: int = 0):
    """Toggled batched grand product. Returns
    (state', ToggledProof, final_point [nv, 16]); the caller ties fp_claims
    to committed fingerprint openings at final_point and recomputes the
    public flag evals itself."""
    leaves = toggled_leaves(flags, fps, shared)
    state, gp, point, claims = prove_batched(
        state, leaves, shared, masks_rng=masks_rng, mask_base=mask_base)

    b = flags.shape[0]
    state, rho = T.challenge_fe(state)
    coeffs = _powers(rho, b)
    masks = None
    nrounds = point.shape[0]
    if shared and masks_rng is not None:
        masks = jnp.stack([
            masks_rng.zero_shares(FR, mask_base + 555_000 + j, (4,))
            for j in range(nrounds)
        ])
    res = SC.prove(
        FR, state, [flags, fps], degree=3,
        comb=_comb_toggled_shared if shared else _comb_toggled,
        consts=(coeffs,), masks=masks, shared=shared, eq_split=point,
    )
    state = res.state
    fp_fin = res.final_polys[1]
    if shared:
        fp_vals = Sh.combine(FR, fp_fin)[..., 0, :]
    else:
        fp_vals = fp_fin[..., 0, :]
    flag_vals = res.final_polys[0][..., 0, :]
    state = T.absorb_fes(FR, state, fp_vals)
    proof = ToggledProof(
        gp=gp,
        leaf_msgs=SC.round_msgs_to_ints(res.round_msgs),
        fp_claims=_to_ints(fp_vals),
        flag_claims=_to_ints(flag_vals),
    )
    return state, proof, res.challenges


def verify_toggled(proof: ToggledProof, ht: T.HostTranscript,
                   flag_eval_fn):
    """Host verification. ``flag_eval_fn(point_ints) -> [B] ints`` evaluates
    the public flag MLEs (the verifier can — flags are bytecode-derived).
    Returns (final_point ints, fp_claims ints) for the opening stage."""
    point, claims = verify_batched(proof.gp, ht)
    b = len(claims)
    rho = ht.challenge()
    coeffs = [pow(rho, i, MOD) for i in range(b)]
    claim = sum(c * cl for c, cl in zip(coeffs, claims)) % MOD
    rs, expected = SC.verify(proof.leaf_msgs, claim, ht)
    flag_vals = flag_eval_fn(rs)
    if flag_vals != proof.flag_claims:
        raise ValueError("toggled GP: flag eval mismatch")
    eq_val = 1
    for rv, pv in zip(rs, point):
        eq_val = eq_val * (rv * pv + (1 - rv) * (1 - pv)) % MOD
    got = 0
    for c_i, f, fp in zip(coeffs, flag_vals, proof.fp_claims):
        e = (f * fp + 1 - f) % MOD
        got = (got + c_i * e) % MOD
    if got * eq_val % MOD != expected:
        raise ValueError("toggled GP: leaf reduction mismatch")
    ht.absorb_many(proof.fp_claims)
    return rs, list(proof.fp_claims)


def verify_batched(proof: GrandProductProof, ht: T.HostTranscript):
    """Host verification. Returns (final_point ints, final_claims ints);
    raises ValueError on failure."""
    b = len(proof.products)
    ht.absorb_many(proof.products)
    claims = list(proof.products)
    point = []

    n_layers = len(proof.layer_msgs)
    for k in range(1, n_layers + 1):
        msgs = proof.layer_msgs[k - 1]
        l_vals, r_vals = proof.layer_claims[k - 1]
        if k == 1:
            expected_each = None
        else:
            coeff = ht.challenge()
            coeffs = [pow(coeff, i, MOD) for i in range(b)]
            claim = sum(c * cl for c, cl in zip(coeffs, claims)) % MOD
            rs, expected = SC.verify(msgs, claim, ht)
            eq_val = 1
            for rv, pv in zip(rs, point):
                eq_val = eq_val * (rv * pv + (1 - rv) * (1 - pv)) % MOD
            got = sum(
                c * l * r for c, l, r in zip(coeffs, l_vals, r_vals)
            ) % MOD * eq_val % MOD
            if got != expected:
                raise ValueError(f"grand product layer {k}: claim mismatch")
            point = rs
        if k == 1:
            for pb, l, r in zip(claims, l_vals, r_vals):
                if l * r % MOD != pb:
                    raise ValueError("grand product top layer mismatch")
        ht.absorb_many(l_vals)
        ht.absorb_many(r_vals)
        mu = ht.challenge()
        claims = [
            (l + mu * (r - l)) % MOD for l, r in zip(l_vals, r_vals)
        ]
        point = [mu] + list(point)
    return point, claims
