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


_WORKER_ART = r"""
import os, sys
pid, nproc, port, artdir = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                            sys.argv[4])
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = flags.replace(
    "--xla_force_host_platform_device_count=8", "") + \
    " --xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["COZK_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from co_zkvms_tpu.parallel import comm, multihost as MH
MH.init(f"127.0.0.1:{port}", nproc, pid)

from co_zkvms_tpu.models import co_spartan, spartan
from co_zkvms_tpu.models.r1cs import R1CSBuilder
from co_zkvms_tpu.ops import pst13
from co_zkvms_tpu.utils import artifacts as ART

b = R1CSBuilder(num_public=2)
x = b.new_wire(); w1 = b.new_wire(); w2 = b.new_wire()
b.add_constraint([(1, x)], [(1, x)], [(1, w1)])
b.add_constraint([(1, w1)], [(1, x)], [(1, w2)])
b.add_constraint([(1, w2), (1, x), (5, 0)], [(1, 0)], [(1, 1)])
r1cs = b.build()
index_host = spartan.SpartanIndex.from_r1cs(r1cs)
srs = pst13.setup_cached(4, seed=7)

mesh = MH.party_chunk_mesh()          # (3, 2) over 3 processes x 2 devices
index = ART.load_spartan_setup(artdir, mesh, r1cs=r1cs)
comm.enable(True); comm.reset()
wit = ART.load_witness_shares(artdir, mesh)
stats = comm.counters(); comm.enable(False)
# THIS process holds exactly one party's slice: party 0/1 processes only
# seed-expand, party 2's only loads explicit chunks (+ the replicated io)
# — never three full share tables (the naive 3*n*64 distribution)
n = 1 << index.nv
per_process = stats.get("artifact_load", 0) + stats.get("seed_expand", 0)
assert per_process <= 2 * n * 64, stats
with mesh:
    proof = co_spartan.prove_rep3(index, srs, None, witness=wit, mesh=mesh)
single = spartan.prove(index_host, srs, [1, 35, 3, 9, 27])
assert proof == single, f"proc {pid}: artifact proof != single-party"
assert spartan.verify(index_host, srs, [35], proof)
print(f"proc {pid} ART OK", flush=True)
"""


def test_three_process_artifact_co_spartan(tmp_path):
    """Per-chunk artifacts across REAL processes: each party process loads/
    seed-expands only its own slices (VERDICT r2 #9) and the joint proof is
    bit-identical to single-party."""
    import jax

    from co_zkvms_tpu.models import spartan
    from co_zkvms_tpu.models.r1cs import R1CSBuilder
    from co_zkvms_tpu.utils import artifacts as ART

    b = R1CSBuilder(num_public=2)
    x = b.new_wire()
    w1 = b.new_wire()
    w2 = b.new_wire()
    b.add_constraint([(1, x)], [(1, x)], [(1, w1)])
    b.add_constraint([(1, w1)], [(1, x)], [(1, w2)])
    b.add_constraint([(1, w2), (1, x), (5, 0)], [(1, 0)], [(1, 1)])
    index = spartan.SpartanIndex.from_r1cs(b.build())
    artdir = str(tmp_path / "artifacts")
    ART.write_spartan_setup(artdir, index, n_chunks=2)
    ART.write_witness_shares(artdir, index, [1, 35, 3, 9, 27],
                             jax.random.key(3), n_chunks=2)

    worker = tmp_path / "worker_art.py"
    worker.write_text(_WORKER_ART)
    port = _free_port()
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    env["COZK_CACHE"] = os.path.join(repo, ".jax_cache")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(p), "3", str(port), artdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for p in range(3)
    ]
    outs = []
    for p, pr in enumerate(procs):
        out, _ = pr.communicate(timeout=1500)
        outs.append(out.decode())
    for p, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"proc {p} failed:\n{out[-3000:]}"
        assert f"proc {p} ART OK" in out


def test_pod_prove_cli_three_process(tmp_path):
    """Turnkey pod entry (VERDICT r3 stretch #8): ``cli.py pod-setup`` +
    3x ``cli.py pod-prove`` rehearsed as REAL processes on CPU — per-host
    artifact loading, bit-identical joint proof, in-process verify on host
    0, and a per-host bytes/latency report line."""
    artdir = str(tmp_path / "pod")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env["COZK_CACHE"] = os.path.join(repo, ".jax_cache")
    env["COZK_PLATFORM"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = flags.replace(
        "--xla_force_host_platform_device_count=8", "") + \
        " --xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)

    setup = subprocess.run(
        [sys.executable, "-m", "co_zkvms_tpu.cli", "pod-setup",
         "--circuit", "synthetic:12", "--artifacts", artdir,
         "--chunks", "2", "--inputs", "3"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=1200)
    assert setup.returncode == 0, setup.stdout.decode()[-3000:]

    port = _free_port()
    out_path = str(tmp_path / "pod_proof.json.gz")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "co_zkvms_tpu.cli", "pod-prove",
             "--artifacts", artdir, "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "3", "--process-id", str(p),
             "--out", out_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for p in range(3)
    ]
    outs = []
    for p, pr in enumerate(procs):
        out, _ = pr.communicate(timeout=1500)
        outs.append(out.decode())
    for p, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"proc {p} failed:\n{out[-3000:]}"
        assert f"[host {p}/3] load" in out          # bytes/latency report
    assert "in-process verify: OK" in outs[0]
    assert os.path.exists(out_path)
