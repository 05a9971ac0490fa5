"""MPC witness generation (VERDICT missing #4): co-Lasso starting from
SHARED operands — a2b bit decomposition, tensor-product one-hot vectors,
scan-based counters — with no party ever holding the plaintext witness.

Conformance bar: combining the generated share stacks reproduces
lasso.build_witness on the plaintext queries EXACTLY (so the downstream
co-Lasso proof is bit-identical to single-party)."""

import random

import jax
import numpy as np
import pytest

from co_zkvms_tpu.models.jolt import instructions as INS
from co_zkvms_tpu.models.jolt import lasso
from co_zkvms_tpu.models.jolt import mpc_witness as MW
from co_zkvms_tpu.models.jolt import subtables as ST
from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops.field import FR
from co_zkvms_tpu.parallel import shares as Sh


@pytest.fixture(autouse=True)
def _mini_geometry():
    ST.set_config(4)
    yield
    ST.set_config(16)


def _combine_ints(stack):
    comb = Sh.combine(FR, stack)
    vals = np.atleast_1d(F.to_int(FR, comb))
    return [int(v) for v in vals.reshape(-1)]


def _ints(arr):
    return [int(v) for v in
            np.asarray(jax.device_get(F.to_int(FR, arr))).reshape(-1)]


def _assert_full_witness(got, want):
    """Share stacks combine to the EXACT plaintext witness: dims, outputs,
    AND the memory-checking columns (e_polys / read_cts / final_cts) that
    feed the grand products."""
    assert got.n == want.n and got.memories == want.memories
    for i in got.dims:
        assert _combine_ints(got.dims[i]) == _ints(want.dims[i]), f"dim {i}"
    for mem in want.memories:
        assert _combine_ints(got.e_polys[mem]) == _ints(
            want.e_polys[mem]), ("e_polys", mem)
        assert _combine_ints(got.read_cts[mem]) == _ints(
            want.read_cts[mem]), ("read_cts", mem)
        assert _combine_ints(got.final_cts[mem]) == _ints(
            want.final_cts[mem]), ("final_cts", mem)
    assert _combine_ints(got.outputs) == _ints(want.outputs)


def _queries(rng, names, k):
    w = ST.WORD
    out = []
    for _ in range(k):
        op = names[rng.randrange(len(names))]
        x, y = rng.randrange(1 << w), rng.randrange(1 << w)
        out.append((op, x, y, INS.lookup_entry(op, x, y)))
    return out


def test_mpc_witness_matches_plaintext():
    rng = random.Random(5)
    names = ("ADD", "AND", "EQ", "SUB", "XOR")   # sum/diff/xy modes
    queries = _queries(rng, names, 7)
    want = lasso.build_witness(queries, instr_names=names)

    xr, yr = MW.share_operands(
        jax.random.key(3), [q[1] for q in queries], [q[2] for q in queries])
    got = MW.generate_witness_rep3(
        jax.random.key(4), xr, yr, [q[0] for q in queries],
        instr_names=names)

    _assert_full_witness(got, want)
    for nm in names:
        assert _combine_ints(got.flags[nm]) == _ints(want.flags[nm])


def test_mpc_witness_mul_and_shift_modes():
    rng = random.Random(9)
    names = ("MUL", "SLL")                        # prod + shift modes
    queries = _queries(rng, names, 5)
    want = lasso.build_witness(queries, instr_names=names)
    xr, yr = MW.share_operands(
        jax.random.key(5), [q[1] for q in queries], [q[2] for q in queries])
    got = MW.generate_witness_rep3(
        jax.random.key(6), xr, yr, [q[0] for q in queries],
        instr_names=names)
    for i in got.dims:
        assert _combine_ints(got.dims[i]) == [
            int(v) for v in np.asarray(
                jax.device_get(F.to_int(FR, want.dims[i]))).reshape(-1)]
    assert _combine_ints(got.outputs) == [
        int(v) for v in np.asarray(
            jax.device_get(F.to_int(FR, want.outputs))).reshape(-1)]


@pytest.mark.slow
def test_co_lasso_from_shared_operands():
    """End-to-end: shared operands -> MPC witness -> Rep3 proof, bit-identical
    to the single-party proof on the same queries."""
    from co_zkvms_tpu.models.jolt import co_lasso
    from co_zkvms_tpu.ops import pst13

    rng = random.Random(11)
    names = ("ADD", "AND", "EQ", "SUB", "XOR")
    queries = _queries(rng, names, 7)
    srs = pst13.setup_cached(ST.C * 2 + 1, seed=11)

    wit = lasso.build_witness(queries, instr_names=names)
    single = lasso.prove(wit, srs)

    xr, yr = MW.share_operands(
        jax.random.key(7), [q[1] for q in queries], [q[2] for q in queries])
    wit3 = MW.generate_witness_rep3(
        jax.random.key(8), xr, yr, [q[0] for q in queries],
        instr_names=names)
    proof3 = co_lasso.prove_rep3(wit3, srs)
    assert proof3 == single
    log_n = wit.n.bit_length() - 1
    assert lasso.verify(proof3, names, log_n, srs)


@pytest.mark.slow
def test_mpc_witness_word32_wide_modes():
    """Architectural WORD=32 geometry (log_m=16): sum/diff indices are 33
    bits and prod indices 64 bits — exercises the 2-limb Z_2^64 ring adder
    + 64-bit Kogge-Stone a2b (VERDICT r2 #4)."""
    ST.set_config(16)
    try:
        rng = random.Random(13)
        names = ("ADD", "SUB", "MUL")         # sum + diff + prod modes
        queries = _queries(rng, names, 4)
        # force full-width operands so the carry/limb paths are live
        queries[0] = ("ADD", 0xFFFFFFFF, 0xFFFFFFFF,
                      INS.lookup_entry("ADD", 0xFFFFFFFF, 0xFFFFFFFF))
        queries[1] = ("MUL", 0xFFFFFFFF, 0xFFFFFFFE,
                      INS.lookup_entry("MUL", 0xFFFFFFFF, 0xFFFFFFFE))
        queries[2] = ("SUB", 0, 0xFFFFFFFF,
                      INS.lookup_entry("SUB", 0, 0xFFFFFFFF))
        want = lasso.build_witness(queries, instr_names=names)
        xr, yr = MW.share_operands(
            jax.random.key(15), [q[1] for q in queries],
            [q[2] for q in queries])
        got = MW.generate_witness_rep3(
            jax.random.key(16), xr, yr, [q[0] for q in queries],
            instr_names=names)
        # full assertion incl. the 64-bit subtable-read/counter path
        # (e_polys / read_cts / final_cts at M=2^16) — VERDICT r3 weak #4
        _assert_full_witness(got, want)
    finally:
        ST.set_config(16)
