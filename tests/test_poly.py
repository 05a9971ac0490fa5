"""MLE ops vs direct Python evaluation."""

import numpy as np
import pytest

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops import poly as P

FR = F.FR
MOD = FR.modulus


def mle_eval_ints(table, point):
    """Direct multilinear evaluation over Python ints (bit k = var k)."""
    acc = list(table)
    for r in point:
        nxt = []
        for j in range(0, len(acc), 2):
            nxt.append((acc[j] + r * (acc[j + 1] - acc[j])) % MOD)
        acc = nxt
    return acc[0]


def test_eq_table_and_eval(rng):
    nv = 4
    r = [rng.randrange(MOD) for _ in range(nv)]
    table = P.eq_table(FR, F.from_int(FR, r))
    vals = F.to_int(FR, table)
    # eq(r, j) = prod over bits
    for j in range(1 << nv):
        want = 1
        for k in range(nv):
            bit = (j >> k) & 1
            want = want * (r[k] if bit else (1 - r[k])) % MOD
        assert int(vals[j]) == want
    # sum of eq table = 1
    assert sum(int(v) for v in vals) % MOD == 1


def test_bind_and_evaluate(rng):
    nv = 5
    table_ints = [rng.randrange(MOD) for _ in range(1 << nv)]
    point = [rng.randrange(MOD) for _ in range(nv)]
    table = F.from_int(FR, table_ints)
    got = int(F.to_int(FR, P.evaluate(FR, table, F.from_int(FR, point))))
    assert got == mle_eval_ints(table_ints, point)


def test_bind_high_matches_reversed(rng):
    nv = 3
    table_ints = [rng.randrange(MOD) for _ in range(1 << nv)]
    r = rng.randrange(MOD)
    table = F.from_int(FR, table_ints)
    hi = P.bind_high(FR, table, F.from_int(FR, r))
    want = [
        (table_ints[j] + r * (table_ints[j + 4] - table_ints[j])) % MOD
        for j in range(4)
    ]
    assert [int(v) for v in F.to_int(FR, hi)] == want


def test_eq_eval_consistency(rng):
    nv = 4
    r = [rng.randrange(MOD) for _ in range(nv)]
    s = [rng.randrange(MOD) for _ in range(nv)]
    dr, ds = F.from_int(FR, r), F.from_int(FR, s)
    # eq_eval(r,s) == evaluate(eq_table(r), s)
    got = int(F.to_int(FR, P.eq_eval(FR, dr, ds)))
    want = int(F.to_int(FR, P.evaluate(FR, P.eq_table(FR, dr), ds)))
    assert got == want


def test_segment_modsum(rng):
    import jax.numpy as jnp

    vals = [rng.randrange(MOD) for _ in range(20)]
    segs = [rng.randrange(4) for _ in range(20)]
    dv = F.from_int(FR, vals)
    out = F.segment_modsum(FR, dv, jnp.array(segs, dtype=jnp.int32), 4)
    got = [int(v) for v in F.to_int(FR, out)]
    want = [0] * 4
    for v, s in zip(vals, segs):
        want[s] = (want[s] + v) % MOD
    assert got == want


def test_linear_combination(rng):
    k, n = 3, 8
    coeffs = [rng.randrange(MOD) for _ in range(k)]
    tables = [[rng.randrange(MOD) for _ in range(n)] for _ in range(k)]
    dc = F.from_int(FR, coeffs)
    dt = F.from_int(FR, tables)
    out = P.linear_combination(FR, dc, dt)
    got = [int(v) for v in F.to_int(FR, out)]
    want = [
        sum(coeffs[i] * tables[i][j] for i in range(k)) % MOD for j in range(n)
    ]
    assert got == want
