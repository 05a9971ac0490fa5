"""co-Lasso: Rep3 MPC instruction lookups with a secret-shared witness.

Maps co-jolt's Rep3InstructionLookupsProver (SURVEY.md §2.8:
instruction_lookups/{worker,coordinator}.rs + Rep3 grand products): the
coordinator-style flow where the witness (flags, dims, E polys, outputs,
counters) is secret-shared (stream_secret_shares semantics — here: seeded
on-device sharing), and

- commitments are per-party MSMs G1-summed (Rep3CommitmentScheme);
- the primary sumcheck runs the SHARED engine: collations nest Rep3 share
  products (SharedDeviceOps), round messages are masked additive shares
  opened into the on-device transcript;
- both memory-checking grand products run the shared GKR (one implicit
  reshare per layer — the reference's ring message);
- openings merge per-party PST13 proofs pointwise.

Produces the SAME LassoProof object, verified by lasso.verify, and
bit-identical to the single-party proof for the same witness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import field as F
from ...ops import grand_product as GP
from ...ops import poly as P
from ...ops import pst13
from ...ops import sumcheck as SC
from ...ops import transcript as T
from ...ops.field import FR
from ...parallel import mpc
from ...parallel import shares as Sh
from ...parallel.rng import CorrelatedRng
from .. import mpc_pcs
from . import instructions as INS
from . import lasso
from . import subtables as ST

MOD = FR.modulus


def share_witness(wit: lasso.LassoWitness, key):
    """Rep3-share every witness polynomial (dims/flags included — they are
    operand-derived and private in co-Jolt)."""
    keys = jax.random.split(key, 64)
    ki = iter(range(64))

    def sh(t):
        return Sh.share(FR, keys[next(ki)], t)

    return wit._replace(
        flags={k: sh(v) for k, v in wit.flags.items()},
        dims={k: sh(v) for k, v in wit.dims.items()},
        e_polys={k: sh(v) for k, v in wit.e_polys.items()},
        outputs=sh(wit.outputs),
        read_cts={k: sh(v) for k, v in wit.read_cts.items()},
        final_cts={k: sh(v) for k, v in wit.final_cts.items()},
    )


def _fp_shared(gamma, tau_i, addr, value, count):
    """Fingerprint over share stacks: tau subtracts at party 0 only."""
    from ...parallel import mpc

    g2 = F.mul(FR, gamma, gamma)
    acc = F.mul(FR, jnp.broadcast_to(g2, count.shape), count)
    acc = F.add(FR, acc, F.mul(FR, jnp.broadcast_to(gamma, value.shape), value))
    acc = F.add(FR, acc, addr)
    neg_tau = F.from_int(FR, (-tau_i) % MOD)
    return mpc.add_public(FR, acc, jnp.broadcast_to(neg_tau, acc.shape[1:]))


def prove_rep3(wit_shared: lasso.LassoWitness, srs: pst13.SRS,
               mask_key=None) -> lasso.LassoProof:
    wit = wit_shared
    n, c = wit.n, ST.C
    log_n = n.bit_length() - 1
    crng = CorrelatedRng.create(
        mask_key if mask_key is not None else jax.random.key(7)
    )
    ht = T.HostTranscript(lasso.LABEL)

    comms = {}
    order = (
        [("flag", nm) for nm in wit.instr_names]
        + [("dim", i) for i in range(c)]
        + [("E", m) for m in wit.memories]
        + [("out",)]
        + [("read_ct", m) for m in wit.memories]
        + [("final_ct", m) for m in wit.memories]
    )

    def get_stack(key):
        kind = key[0]
        if kind == "flag":
            return wit.flags[key[1]]
        if kind == "dim":
            return wit.dims[key[1]]
        if kind == "E":
            return wit.e_polys[key[1]]
        if kind == "out":
            return wit.outputs
        if kind == "read_ct":
            return wit.read_cts[key[1]]
        if kind == "final_ct":
            return wit.final_cts[key[1]]
        raise KeyError(key)

    for key, cm in zip(order,
                       mpc_pcs.commit_shares_batch(
                           srs, [get_stack(k) for k in order])):
        comms[key] = cm
        ht.absorb_point(cm.xy)

    r = ht.challenges(log_n)
    polys = (
        [wit.flags[nm] for nm in wit.instr_names]
        + [wit.e_polys[m] for m in wit.memories]
        + [wit.outputs]
    )
    degree = 2 + max(INS.INSTRUCTIONS[nm].degree for nm in wit.instr_names)
    comb, mono_consts = lasso.monomial_setup(
        wit.instr_names, wit.memories, shared=True)
    masks = jnp.stack(
        [crng.zero_shares(FR, 5000 + j, (degree + 1,)) for j in range(log_n)]
    )
    res = SC.prove(FR, ht.device_state(), polys, degree=degree, comb=comb,
                   consts=mono_consts, masks=masks, shared=True,
                   round_consts=[(crng.key_data, jnp.uint32(40_000 + j))
                                 for j in range(log_n)],
                   eq_split=F.from_int(FR, r))
    ht.state = T.HostTranscript.from_device_state(res.state).state
    r_z = res.challenges

    rz_keys = [("flag", nm) for nm in wit.instr_names] + \
        [("E", m) for m in wit.memories] + [("out",)]
    evals_rz = {}
    for key in rz_keys:
        # share-side binding; only the scalar is opened (no plaintext poly)
        evals_rz[key] = mpc.eval_open(FR, get_stack(key), r_z)
        ht.absorb(evals_rz[key])
    eta = ht.challenge()
    _, proof_rz = mpc_pcs.batch_open_shares(
        srs, [get_stack(k) for k in rz_keys], F.from_int(FR, eta), r_z
    )

    gamma_i, tau_i = ht.challenges(2)
    gamma = F.from_int(FR, gamma_i)
    addr_m = Sh.promote_public(FR, F.from_int(FR, list(range(ST.M))))

    rw_leaves, if_leaves = [], []
    one = F.ones_mont(FR)
    for mem in wit.memories:
        sub, chunk = mem
        dim_t = wit.dims[chunk]
        e_t = wit.e_polys[mem]
        rc = wit.read_cts[mem]
        wc = F.add(FR, rc, Sh.promote_public(
            FR, jnp.broadcast_to(one, rc.shape[1:])))
        rw_leaves.append(_fp_shared(gamma, tau_i, dim_t, e_t, rc))
        rw_leaves.append(_fp_shared(gamma, tau_i, dim_t, e_t, wc))
        t_pub = Sh.promote_public(FR, ST.materialize(sub))
        zeros = jnp.zeros_like(wit.final_cts[mem])
        if_leaves.append(_fp_shared(gamma, tau_i, addr_m, t_pub, zeros))
        if_leaves.append(_fp_shared(gamma, tau_i, addr_m, t_pub,
                                    wit.final_cts[mem]))

    # stack as [3, B, n, 16] share batches for the shared GKR
    rw_stack = jnp.stack(rw_leaves, axis=1)
    if_stack = jnp.stack(if_leaves, axis=1)
    state = ht.device_state()
    state, rw_proof, rho_rw, _ = GP.prove_batched(
        state, rw_stack, shared=True, masks_rng=crng, mask_base=6000)
    state, if_proof, rho_if, _ = GP.prove_batched(
        state, if_stack, shared=True, masks_rng=crng, mask_base=7000)
    ht.state = T.HostTranscript.from_device_state(state).state

    rw_keys = [("E", m) for m in wit.memories] + \
        [("dim", i) for i in range(c)] + \
        [("read_ct", m) for m in wit.memories]
    evals_rw = {}
    for key in rw_keys:
        evals_rw[key] = mpc.eval_open(FR, get_stack(key), rho_rw)
        ht.absorb(evals_rw[key])
    eta_rw = ht.challenge()
    _, proof_rw = mpc_pcs.batch_open_shares(
        srs, [get_stack(k) for k in rw_keys], F.from_int(FR, eta_rw), rho_rw
    )

    if_keys = [("final_ct", m) for m in wit.memories]
    evals_if = {}
    for key in if_keys:
        evals_if[key] = mpc.eval_open(FR, get_stack(key), rho_if)
        ht.absorb(evals_if[key])
    eta_if = ht.challenge()
    _, proof_if = mpc_pcs.batch_open_shares(
        srs, [get_stack(k) for k in if_keys], F.from_int(FR, eta_if), rho_if
    )

    return lasso.LassoProof(
        comms={k: v.xy for k, v in comms.items()},
        primary_msgs=SC.round_msgs_to_ints(res.round_msgs),
        evals_rz=evals_rz,
        rw_products=rw_proof,
        if_products=if_proof,
        evals_rw=evals_rw,
        evals_if=evals_if,
        proof_rz=proof_rz,
        proof_rw=proof_rw,
        proof_if=proof_if,
    )
