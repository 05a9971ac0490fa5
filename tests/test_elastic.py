"""Elastic / partial-mesh proving (VERDICT r2 missing #8, SURVEY row 36):
a preempted co-Spartan proof RESUMES from its phase journal on a SMALLER
mesh — the TPU-native replacement for the reference's dummy-worker +
subnet extend/trim machinery (mesh-agnostic SPMD phases + deterministic
Fiat-Shamir replay mean there is no per-worker schedule to re-align)."""

import os

import numpy as np

import jax
import pytest

from co_zkvms_tpu.models import co_spartan, spartan
from co_zkvms_tpu.models.synthetic import squaring_chain
from co_zkvms_tpu.ops import pst13
from co_zkvms_tpu.utils import checkpoint as CK


@pytest.fixture(scope="module")
def setup():
    b = squaring_chain(28)
    z = b.solve_witness([3])
    index = spartan.SpartanIndex.from_r1cs(b.build())
    srs = pst13.setup_cached(index.nv, seed=7)
    return index, z, srs


def _mesh(n):
    return jax.sharding.Mesh(
        np.array(jax.devices()[:n]).reshape(n), ("chunk",))


def test_resume_on_smaller_mesh(setup, tmp_path):
    index, z, srs = setup
    single = spartan.prove(index, srs, z)

    # run to completion on the full 8-device mesh, journaling phases
    with _mesh(8):
        p_full = co_spartan.prove_rep3(index, srs, z, mesh=_mesh(8),
                                       ckpt=str(tmp_path))
    assert p_full == single

    # simulate preemption AFTER sumcheck1: later phases lost
    digest_dir = next(os.scandir(str(tmp_path))).path
    for name in ("sumcheck2", "opening"):
        os.remove(os.path.join(digest_dir, f"{name}.ckpt.gz"))

    # resume on HALF the devices: commit + sumcheck1 load from the journal,
    # the remaining phases run on the shrunken mesh — identical proof
    with _mesh(4):
        ck = CK.Checkpointer(str(tmp_path),
                             os.path.basename(digest_dir),
                             registry=spartan._ckpt_registry())
        p_resumed = co_spartan.prove_rep3(index, srs, z, mesh=_mesh(4),
                                          ckpt=ck)
    assert ck.loaded == 2 and ck.computed == 2
    assert p_resumed == single
    assert spartan.verify(index, srs, [3], p_resumed)


def test_remesh_share_stack(setup):
    """remesh(): same global values after an elastic resize."""
    from co_zkvms_tpu.ops import field as F
    from co_zkvms_tpu.ops.field import FR
    from co_zkvms_tpu.parallel import multihost as MH
    from co_zkvms_tpu.parallel import shares as Sh

    secret = F.from_int(FR, list(range(1, 17)))
    stack = Sh.share(FR, jax.random.key(2), secret)
    placed = MH.remesh(stack, _mesh(8))
    moved = MH.remesh(placed, _mesh(2))
    got = [int(v) for v in np.asarray(jax.device_get(
        F.to_int(FR, Sh.combine(FR, moved)))).reshape(-1)]
    assert got == list(range(1, 17))
