"""Lasso instruction lookups: primary sumcheck + offline memory checking.

Maps co-jolt's instruction-lookups subsystem (SURVEY.md §2.8: witness
[instruction_lookups/witness.rs], primary sumcheck [worker.rs:180-451],
memory checking via grand products, openings): for a trace of lookup queries

  step j:  instruction I_j, operands (x_j, y_j), output out_j

the prover commits per-instruction flags, chunk address polys (dims),
subtable read values E_{(sub,chunk)}, outputs, and read/final counters, then
shows

  (1) collation (primary sumcheck, zerocheck over the trace domain):
      0 = sum_j eq(r, j) * [ sum_I flag_I(j) * g_I(E(j)) - out(j) ]
  (2) E-consistency (per (sub,chunk) memory, offline memory checking):
      RS * Init-untouched == WS ... encoded as the two fingerprint grand
      products  prod(RS) * prod(final) == prod(WS) * prod(init)
      with fp(a,v,t) = gamma^2 t + gamma v + a - tau, proven by the batched
      GKR engine; final GKR claims are linear in committed polys.

Single-party prover here; the Rep3 variant shares flags/E/outputs and reuses
the shared sumcheck/GKR paths (round 2).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ...ops import field as F
from ...ops import grand_product as GP
from ...ops import poly as P
from ...ops import pst13
from ...ops import sumcheck as SC
from ...ops import transcript as T
from ...ops.field import FR
from . import instructions as INS
from . import subtables as ST

MOD = FR.modulus
LABEL = b"co_zkvms_tpu/lasso/v1"


class LassoWitness(NamedTuple):
    instr_names: tuple
    memories: tuple             # ((subtable, chunk), ...)
    n: int                      # padded trace length (power of 2)
    flags: dict                 # name -> [n, 16]
    dims: dict                  # chunk -> [n, 16] (addresses as field elems)
    dims_int: np.ndarray        # [C, n] host ints
    e_polys: dict               # mem -> [n, 16]
    outputs: jnp.ndarray        # [n, 16]
    read_cts: dict              # mem -> [n, 16]
    final_cts: dict             # mem -> [M, 16]


class LassoProof(NamedTuple):
    comms: dict                 # name -> (x, y)
    primary_msgs: list
    evals_rz: dict              # opened values at r_z
    rw_products: GP.GrandProductProof
    if_products: GP.GrandProductProof
    evals_rw: dict              # opened at rho_rw
    evals_if: dict              # opened at rho_if
    proof_rz: pst13.OpeningProof
    proof_rw: pst13.OpeningProof
    proof_if: pst13.OpeningProof


def build_witness(queries, instr_names=None, pad_to=None) -> LassoWitness:
    """``queries``: list of (instr_name, x, y, output) host tuples."""
    if instr_names is None:
        instr_names = tuple(sorted({q[0] for q in queries}))
    memories = tuple(INS.memories_for(instr_names))
    n_real = len(queries)
    n = pad_to or max(4, 1 << (n_real - 1).bit_length())
    c = ST.C

    flags = {name: [0] * n for name in instr_names}
    dims = np.zeros((c, n), dtype=np.int64)
    outputs = [0] * n
    for j, (name, x, y, out) in enumerate(queries):
        flags[name][j] = 1
        idxs = INS.INSTRUCTIONS[name].to_indices(x, y)
        for i in range(c):
            dims[i, j] = idxs[i]
        outputs[j] = out

    e_vals = {}
    read_cts = {}
    final_cts = {}
    for mem in memories:
        sub, chunk = mem
        table = ST.materialize_ints(sub)
        addr_seq = dims[chunk]
        ev, rc = [], []
        counts = {}
        for a in addr_seq:
            a = int(a)
            ev.append(table[a])
            t = counts.get(a, 0)
            rc.append(t)
            counts[a] = t + 1
        fc = [counts.get(a, 0) for a in range(ST.M)]
        e_vals[mem] = ev
        read_cts[mem] = rc
        final_cts[mem] = fc

    return LassoWitness(
        instr_names=instr_names,
        memories=memories,
        n=n,
        flags={k: F.from_int(FR, v) for k, v in flags.items()},
        dims={i: F.from_int(FR, [int(v) for v in dims[i]]) for i in range(c)},
        dims_int=dims,
        e_polys={m: F.from_int(FR, v) for m, v in e_vals.items()},
        outputs=F.from_int(FR, outputs),
        read_cts={m: F.from_int(FR, v) for m, v in read_cts.items()},
        final_cts={m: F.from_int(FR, v) for m, v in final_cts.items()},
    )


def _monomial_comb_factory(n_f, n_m, bucket_dims, shared):
    """Data-driven collation comb: sum_I flag_I * g_I(E) as scanned monomials.

    The instruction set enters as DATA (consts = per-bucket (sel, coeff)
    tensors from INS.monomial_table), not as unrolled XLA graph — the kernel
    is a lax.scan whose body does at most max(bucket_dims) field (or Rep3
    share) products, so compile time is bounded regardless of how many
    instructions are active (fixes the one-megakernel-per-instruction-set
    compile pathology; maps combine_lookups[_rep3] evaluation,
    instruction_lookups/worker.rs:362-451).
    """
    import jax

    from ...parallel import mpc
    from ...parallel.rng import zero_shares_from_keys

    def comb(polys, consts, chunk_i=None, t_idx=None):
        eq = polys[0]
        vals = list(polys[1 : 1 + n_f + n_m])   # flags then Es
        out = polys[1 + n_f + n_m]
        onev = jnp.broadcast_to(F.ones_mont(FR), vals[0].shape[-2:])
        if shared:
            z = jnp.zeros_like(onev)
            onev = jnp.stack([onev, z, z])      # trivial share of 1
            # trailing consts: correlated-rng key_data [3, K] + round
            # counter (runtime scalar) — combined with the engine-supplied
            # chunk counter and t-lane index, every reshare mask is fresh
            # per (round, chunk, t, term, chain position)
            key_data, round_ctr = consts[-2], consts[-1]
        V = jnp.stack(vals + [onev])            # [n_f+n_m+1, (3,) h, 16]
        acc = jnp.zeros_like(vals[0])
        for bi, d in enumerate(bucket_dims):
            sel, coeff = consts[2 * bi], consts[2 * bi + 1]
            n_terms = sel.shape[0]

            def body(a, xs, d=d, bi=bi):
                s, co, ti = xs                  # [1+d] int32, [16], scalar
                p = V[s[0]]                     # the flag factor
                for k in range(1, 1 + d):
                    if shared and k >= 2:
                        # p is the previous mul's ADDITIVE output; the next
                        # 3-term mul takes its b-component (= the implicit
                        # ring reshare, rep3/arithmetic.rs:51-105) — add a
                        # fresh zero share before that message exists
                        local = jnp.uint32((bi << 3) | k)
                        p = F.add(FR, p, zero_shares_from_keys(
                            FR, key_data, p.shape[1:-1],
                            round_ctr, chunk_i, t_idx, ti, local))
                    q = V[s[k]]
                    p = mpc.mul(FR, p, q) if shared else F.mul(FR, p, q)
                term = F.mul(FR, p, jnp.broadcast_to(co, p.shape))
                return F.add(FR, a, term), None

            acc, _ = jax.lax.scan(
                body, acc,
                (sel, coeff, jnp.arange(n_terms, dtype=jnp.uint32)))
        return F.mul(FR, eq, F.sub(FR, acc, out))

    if shared:
        comb.wants_ctr = True
    return comb


_comb_cache = {}
_mono_cache = {}


def monomial_setup(instr_names, memories, shared=False):
    """(comb, consts) pair driving the collation kernel for this set."""
    key = (tuple(instr_names), tuple(memories), shared)
    if key not in _mono_cache:
        tables = INS.monomial_table(instr_names, memories)
        bucket_dims = tuple(t[0].shape[1] - 1 for t in tables)
        ckey = (len(instr_names), len(memories), bucket_dims, shared)
        if ckey not in _comb_cache:
            _comb_cache[ckey] = _monomial_comb_factory(*ckey)
        consts = []
        for sel, coeffs in tables:
            consts.append(jnp.asarray(sel))
            consts.append(F.from_int(FR, coeffs))
        _mono_cache[key] = (_comb_cache[ckey], tuple(consts))
    return _mono_cache[key]


def _fingerprint(gamma, tau, addr, value, count):
    """gamma^2 * count + gamma * value + addr - tau on device tables."""
    g2 = F.mul(FR, gamma, gamma)
    acc = F.mul(FR, jnp.broadcast_to(g2, count.shape), count)
    acc = F.add(FR, acc, F.mul(FR, jnp.broadcast_to(gamma, value.shape), value))
    acc = F.add(FR, acc, addr)
    return F.sub(FR, acc, jnp.broadcast_to(tau, acc.shape))


def prove(wit: LassoWitness, srs: pst13.SRS) -> LassoProof:
    n, c = wit.n, ST.C
    log_n = n.bit_length() - 1
    ht = T.HostTranscript(LABEL)

    # 1. commit everything, absorb in canonical order
    comms = {}
    order = (
        [("flag", nm) for nm in wit.instr_names]
        + [("dim", i) for i in range(c)]
        + [("E", m) for m in wit.memories]
        + [("out",)]
        + [("read_ct", m) for m in wit.memories]
        + [("final_ct", m) for m in wit.memories]
    )

    def get_table(key):
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
                       pst13.commit_batch(srs,
                                          [get_table(k) for k in order])):
        comms[key] = cm
        ht.absorb_point(cm.xy)

    # 2. primary sumcheck (zerocheck; Dao-Thaler split-eq)
    r = ht.challenges(log_n)
    polys = (
        [wit.flags[nm] for nm in wit.instr_names]
        + [wit.e_polys[m] for m in wit.memories]
        + [wit.outputs]
    )
    degree = 2 + max(INS.INSTRUCTIONS[nm].degree for nm in wit.instr_names)
    comb, mono_consts = monomial_setup(wit.instr_names, wit.memories)
    res = SC.prove(FR, ht.device_state(), polys, degree=degree, comb=comb,
                   consts=mono_consts, eq_split=F.from_int(FR, r))
    ht.state = T.HostTranscript.from_device_state(res.state).state
    r_z = res.challenges

    # openings at r_z: flags, Es, out
    rz_keys = [("flag", nm) for nm in wit.instr_names] + \
        [("E", m) for m in wit.memories] + [("out",)]
    evals_rz = {}
    for key in rz_keys:
        evals_rz[key] = int(F.to_int(FR, P.evaluate(FR, get_table(key), r_z)))
        ht.absorb(evals_rz[key])
    eta = ht.challenge()
    _, proof_rz = pst13.batch_open(
        srs, [get_table(k) for k in rz_keys], F.from_int(FR, eta), r_z
    )

    # 3. memory checking
    gamma_i, tau_i = ht.challenges(2)
    gamma = F.from_int(FR, gamma_i)
    tau = F.from_int(FR, tau_i)
    addr_m = F.from_int(FR, list(range(ST.M)))

    rw_leaves = []
    if_leaves = []
    one = F.ones_mont(FR)
    for mem in wit.memories:
        sub, chunk = mem
        dim_t = wit.dims[chunk]
        e_t = wit.e_polys[mem]
        rc = wit.read_cts[mem]
        wc = F.add(FR, rc, jnp.broadcast_to(one, rc.shape))
        rw_leaves.append(_fingerprint(gamma, tau, dim_t, e_t, rc))
        rw_leaves.append(_fingerprint(gamma, tau, dim_t, e_t, wc))
        t_table = ST.materialize(sub)
        zeros = jnp.zeros_like(wit.final_cts[mem])
        if_leaves.append(_fingerprint(gamma, tau, addr_m, t_table, zeros))
        if_leaves.append(_fingerprint(gamma, tau, addr_m, t_table,
                                      wit.final_cts[mem]))

    state = ht.device_state()
    state, rw_proof, rho_rw, _ = GP.prove_batched(state, jnp.stack(rw_leaves))
    state, if_proof, rho_if, _ = GP.prove_batched(state, jnp.stack(if_leaves))
    ht.state = T.HostTranscript.from_device_state(state).state

    # openings at rho_rw (E, dim, read_ct) and rho_if (final_ct)
    rw_keys = [("E", m) for m in wit.memories] + \
        [("dim", i) for i in range(c)] + \
        [("read_ct", m) for m in wit.memories]
    evals_rw = {}
    for key in rw_keys:
        evals_rw[key] = int(F.to_int(FR, P.evaluate(FR, get_table(key), rho_rw)))
        ht.absorb(evals_rw[key])
    eta_rw = ht.challenge()
    _, proof_rw = pst13.batch_open(
        srs, [get_table(k) for k in rw_keys], F.from_int(FR, eta_rw), rho_rw
    )

    if_keys = [("final_ct", m) for m in wit.memories]
    evals_if = {}
    for key in if_keys:
        evals_if[key] = int(F.to_int(FR, P.evaluate(FR, get_table(key), rho_if)))
        ht.absorb(evals_if[key])
    eta_if = ht.challenge()
    _, proof_if = pst13.batch_open(
        srs, [get_table(k) for k in if_keys], F.from_int(FR, eta_if), rho_if
    )

    return LassoProof(
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


def _eq_eval_ints(r, s):
    acc = 1
    for a, b in zip(r, s):
        acc = acc * (a * b + (1 - a) * (1 - b)) % MOD
    return acc


def verify(proof: LassoProof, instr_names, log_n: int, srs: pst13.SRS) -> bool:
    instr_names = tuple(instr_names)
    memories = tuple(INS.memories_for(instr_names))
    c = ST.C
    ht = T.HostTranscript(LABEL)
    order = (
        [("flag", nm) for nm in instr_names]
        + [("dim", i) for i in range(c)]
        + [("E", m) for m in memories]
        + [("out",)]
        + [("read_ct", m) for m in memories]
        + [("final_ct", m) for m in memories]
    )
    for key in order:
        if key not in proof.comms:
            return False
        ht.absorb_point(proof.comms[key])

    r = ht.challenges(log_n)
    degree = 2 + max(INS.INSTRUCTIONS[nm].degree for nm in instr_names)
    try:
        r_z, expected = SC.verify(proof.primary_msgs, 0, ht)
    except ValueError:
        return False
    if len(proof.primary_msgs[0]) != degree + 1:
        return False

    ev = proof.evals_rz
    ev_mem = {m: ev[("E", m)] for m in memories}
    ops = INS.HostOps()
    acc = 0
    for nm in instr_names:
        g = INS.INSTRUCTIONS[nm].combine(ops, ev_mem)
        acc = (acc + ev[("flag", nm)] * g) % MOD
    got = _eq_eval_ints(r, r_z) * (acc - ev[("out",)]) % MOD
    if got != expected:
        return False

    rz_keys = [("flag", nm) for nm in instr_names] + \
        [("E", m) for m in memories] + [("out",)]
    for key in rz_keys:
        ht.absorb(ev[key])
    eta = ht.challenge()
    agg = pst13.aggregate_evals_ints(eta, [ev[k] for k in rz_keys])
    if not pst13.batch_verify(
        srs, [pst13.Commitment(proof.comms[k]) for k in rz_keys],
        [ev[k] for k in rz_keys], eta, r_z, agg, proof.proof_rz,
    ):
        return False

    gamma, tau = ht.challenges(2)

    # grand products
    try:
        rho_rw, claims_rw = GP.verify_batched(proof.rw_products, ht)
        rho_if, claims_if = GP.verify_batched(proof.if_products, ht)
    except ValueError:
        return False

    # multiset equality per memory: prod(RS) * prod(final) == prod(WS) * prod(init)
    for i, mem in enumerate(memories):
        rs_p = proof.rw_products.products[2 * i]
        ws_p = proof.rw_products.products[2 * i + 1]
        init_p = proof.if_products.products[2 * i]
        fin_p = proof.if_products.products[2 * i + 1]
        if rs_p * fin_p % MOD != ws_p * init_p % MOD:
            return False

    # GKR leaf claims vs openings (rw side)
    evrw = proof.evals_rw
    for i, mem in enumerate(memories):
        sub, chunk = mem
        e_v = evrw[("E", mem)]
        d_v = evrw[("dim", chunk)]
        rc_v = evrw[("read_ct", mem)]
        fp_r = (gamma * gamma % MOD * rc_v + gamma * e_v + d_v - tau) % MOD
        fp_w = (gamma * gamma % MOD * (rc_v + 1) + gamma * e_v + d_v - tau) % MOD
        if claims_rw[2 * i] != fp_r or claims_rw[2 * i + 1] != fp_w:
            return False

    # init/final side: table and address MLEs are verifier-computable
    evif = proof.evals_if
    idx_eval = sum((1 << b) * rho_if[b] for b in range(len(rho_if))) % MOD
    table_evals = {}
    for i, mem in enumerate(memories):
        sub, chunk = mem
        if sub not in table_evals:
            table_evals[sub] = ST.evaluate_mle_ints(sub, rho_if)
        t_v = table_evals[sub]
        fc_v = evif[("final_ct", mem)]
        fp_i = (gamma * t_v + idx_eval - tau) % MOD
        fp_f = (gamma * gamma % MOD * fc_v + gamma * t_v + idx_eval - tau) % MOD
        if claims_if[2 * i] != fp_i or claims_if[2 * i + 1] != fp_f:
            return False

    # batched openings at rho_rw / rho_if
    rw_keys = [("E", m) for m in memories] + \
        [("dim", i) for i in range(c)] + \
        [("read_ct", m) for m in memories]
    for key in rw_keys:
        ht.absorb(evrw[key])
    eta_rw = ht.challenge()
    agg_rw = pst13.aggregate_evals_ints(eta_rw, [evrw[k] for k in rw_keys])
    if not pst13.batch_verify(
        srs, [pst13.Commitment(proof.comms[k]) for k in rw_keys],
        [evrw[k] for k in rw_keys], eta_rw, rho_rw, agg_rw, proof.proof_rw,
    ):
        return False

    if_keys = [("final_ct", m) for m in memories]
    for key in if_keys:
        ht.absorb(evif[key])
    eta_if = ht.challenge()
    agg_if = pst13.aggregate_evals_ints(eta_if, [evif[k] for k in if_keys])
    return pst13.batch_verify(
        srs, [pst13.Commitment(proof.comms[k]) for k in if_keys],
        [evif[k] for k in if_keys], eta_if, rho_if, agg_if, proof.proof_if,
    )
