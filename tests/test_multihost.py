"""Real multi-process co-proving: 3 jax.distributed processes (one per
party), party axis over the process boundary (the DCN stand-in), chunk axis
on each process's local devices. Every process must produce the SAME proof,
bit-identical to the single-process single-party proof.

This is the multi-host deployment path of SURVEY.md §2.3 exercised for
real — cross-process collectives via gloo on CPU, same code as a TPU pod.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = flags.replace(
    "--xla_force_host_platform_device_count=8", "") + \
    " --xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["COZK_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from co_zkvms_tpu.parallel import multihost as MH
MH.init(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc

from co_zkvms_tpu.models import co_spartan, spartan
from co_zkvms_tpu.models.r1cs import R1CSBuilder
from co_zkvms_tpu.ops import pst13

b = R1CSBuilder(num_public=2)
x = b.new_wire(); w1 = b.new_wire(); w2 = b.new_wire()
b.add_constraint([(1, x)], [(1, x)], [(1, w1)])
b.add_constraint([(1, w1)], [(1, x)], [(1, w2)])
b.add_constraint([(1, w2), (1, x), (5, 0)], [(1, 0)], [(1, 1)])
index = spartan.SpartanIndex.from_r1cs(b.build())
srs = pst13.setup_cached(4, seed=7)
z = [1, 35, 3, 9, 27]

mesh = MH.party_chunk_mesh()          # (3, 2) over 3 processes x 2 devices
assert mesh.shape == {"party": 3, "chunk": 2}
proof = co_spartan.prove_rep3(index, srs, z, mesh=mesh)
single = spartan.prove(index, srs, z)
assert proof == single, f"proc {pid}: mpc proof != single-party"
assert spartan.verify(index, srs, [35], proof)
print(f"proc {pid} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_three_process_co_spartan(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    env["COZK_CACHE"] = os.path.join(repo, ".jax_cache")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(p), "3", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for p in range(3)
    ]
    outs = []
    for p, pr in enumerate(procs):
        out, _ = pr.communicate(timeout=1500)
        outs.append(out.decode())
    for p, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"proc {p} failed:\n{out[-3000:]}"
        assert f"proc {p} OK" in out
