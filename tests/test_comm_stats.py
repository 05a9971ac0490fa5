"""Communication accounting (mpc-net bandwidth counters parity): Rep3
primitives record the bytes a real 3-party split would move over the ring."""

import jax

from co_zkvms_tpu.ops import field as F
from co_zkvms_tpu.ops.field import FR
from co_zkvms_tpu.parallel import binary as B
from co_zkvms_tpu.parallel import comm
from co_zkvms_tpu.parallel import mpc
from co_zkvms_tpu.parallel import shares as Sh


def test_counters_track_primitives():
    comm.reset()
    comm.enable(True)
    try:
        x = Sh.share(FR, jax.random.key(0), F.from_int(FR, list(range(8))))
        y = Sh.share(FR, jax.random.key(1), F.from_int(FR, list(range(8))))
        comm.checkpoint()
        # a [3, 8, 16] mul reshares 8*16 u32 per party = 512 B
        _ = mpc.mul(FR, x, y)
        d = comm.delta()
        assert d["ring_reshare"] == 8 * 16 * 4
        comm.checkpoint()
        _ = Sh.combine(FR, x)
        d = comm.delta()
        assert d["open"] == 2 * 8 * 16 * 4
    finally:
        comm.enable(False)
        comm.reset()


def test_kogge_stone_volume():
    """a2b = 2 KS adders x 11 ANDs (1 init + 5 levels x 2 chains) x n u32:
    22*n*4 bytes of binary reshares per conversion."""
    comm.reset()
    comm.enable(True)
    try:
        import jax.numpy as jnp

        xs = jnp.arange(4, dtype=jnp.uint32)
        rs = B.ring_share(jax.random.key(2), xs)
        comm.checkpoint()
        _ = B.a2b(rs, jax.random.key(3))
        d = comm.delta()
        assert d["ring_reshare_binary"] == 22 * 4 * 4
    finally:
        comm.enable(False)
        comm.reset()


def test_disabled_by_default():
    comm.reset()
    x = Sh.share(FR, jax.random.key(0), F.from_int(FR, [1, 2]))
    _ = Sh.combine(FR, x)
    assert comm.counters() == {}


def test_report_format():
    comm.reset()
    comm.enable(True)
    try:
        comm.record("ring_reshare", 3 * 1024 * 1024)
        rep = comm.report("phase1")
        assert "phase1" in rep and "3.00 MiB" in rep
    finally:
        comm.enable(False)
        comm.reset()
