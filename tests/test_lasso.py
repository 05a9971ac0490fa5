"""Lasso instruction lookups: collation math + end-to-end prove/verify.

Uses the small subtable geometry (log_m=8 => 4-bit "bytes", 16-bit operands)
so the init/final memory-checking grand products stay CPU-test sized; the
architectural default (2^16 tables, 32-bit operands) exercises identical code.
"""

import pytest

from co_zkvms_tpu.models.jolt import instructions as INS
from co_zkvms_tpu.models.jolt import lasso
from co_zkvms_tpu.models.jolt import subtables as ST
from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import pst13

MOD = F.FR.modulus


@pytest.fixture(autouse=True, scope="module")
def small_tables():
    ST.set_config(4)   # M = 16, 8-bit operands: CPU-test sized GKR trees
    yield
    ST.set_config(16)


def _expected(op, x, y, w):
    """Independent W-bit semantics of each lookup instruction."""
    mask = (1 << w) - 1
    sx = x - (1 << w) if x >> (w - 1) else x
    sy = y - (1 << w) if y >> (w - 1) else y
    return {
        "AND": x & y, "OR": x | y, "XOR": x ^ y,
        "ADD": (x + y) & mask, "SUB": (x - y) & mask,
        "EQ": int(x == y), "NE": int(x != y),
        "LTU": int(x < y), "GEU": int(x >= y),
        "SLT": int(sx < sy), "GE": int(sx >= sy),
    }[op]


def test_collation_matches_semantics(rng):
    w = ST.WORD
    ops = INS.HostOps()
    for name, spec in INS.INSTRUCTIONS.items():
        if spec.index_mode == "shift" and (1 << ST.BYTE) < ST.WORD:
            continue   # shift layout needs y%WORD to fit the y-half
        for _ in range(30):
            x = rng.randrange(1 << w)
            y = rng.randrange(1 << w)
            idxs = spec.to_indices(x, y)
            ev = {}
            for sub, chunk in spec.subtable_chunks:
                table = ST.materialize_ints(sub)
                ev[(sub, chunk)] = table[idxs[chunk]]
            got = spec.combine(ops, ev)
            want = INS.lookup_entry(name, x, y)
            assert got == want, (name, x, y, got, want)


@pytest.fixture(scope="module")
def srs():
    return pst13.setup_cached(ST.C * 2 + 1, seed=11)  # log_m=8 -> nv 8 >= log n


def test_lasso_e2e(rng, srs):
    w = ST.WORD
    names = ("ADD", "AND", "EQ", "SUB", "XOR")  # match test_jolt_e2e: shares compiled kernels
    queries = []
    for _ in range(13):
        op = names[rng.randrange(len(names))]
        x = rng.randrange(1 << w)
        y = rng.randrange(1 << w)
        queries.append((op, x, y, _expected(op, x, y, w)))

    wit = lasso.build_witness(queries, instr_names=names)
    proof = lasso.prove(wit, srs)
    log_n = wit.n.bit_length() - 1
    assert lasso.verify(proof, names, log_n, srs)

    # a wrong lookup output must be rejected
    bad_queries = list(queries)
    op, x, y, out = bad_queries[0]
    bad_queries[0] = (op, x, y, (out + 1) % (1 << w))
    bad_wit = lasso.build_witness(bad_queries, instr_names=names)
    bad_proof = lasso.prove(bad_wit, srs)
    assert not lasso.verify(bad_proof, names, log_n, srs)


def test_lasso_rejects_tampered_counter(rng, srs):
    w = ST.WORD
    names = ("ADD", "AND", "EQ", "SUB", "XOR")
    queries = [("AND", 5, 7, 5 & 7), ("AND", 5, 7, 5 & 7)]
    wit = lasso.build_witness(queries, instr_names=names)
    # corrupt a read counter: memory check must fail
    mem = wit.memories[0]
    bad_rc = dict(wit.read_cts)
    bad_rc[mem] = F.from_int(F.FR, [7] * wit.n)
    bad_wit = wit._replace(read_cts=bad_rc)
    proof = lasso.prove(bad_wit, srs)
    assert not lasso.verify(proof, names, wit.n.bit_length() - 1, srs)
