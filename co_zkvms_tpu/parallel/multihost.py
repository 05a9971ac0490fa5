"""Multi-host deployment: jax.distributed runtime + party-over-DCN meshes.

Maps mpc-net's distributed backend (SURVEY.md §2.3) the TPU-native way: the
reference runs 3 parties x W workers as QUIC processes; here each HOST is a
jax.distributed process contributing its local chips, and the protocol is
the same single-controller SPMD program over a global ("party", "chunk")
mesh — party-axis collectives (the Rep3 reshare ring / opens) ride DCN
between hosts, chunk-axis reductions ride ICI inside a host. There is no
coordinator process: Fiat-Shamir is replicated host-side (every process
derives identical challenges from opened values), which deletes the
reference's per-round star RTTs.

Deployment model (mirrors the reference's one-party-per-machine trust
assumption): 3 hosts, process p holding party p's share slice. The same
code also runs 1-process (all parties local — the test/simulation layout)
or 3k-process (chunk axis across host groups).
"""

from __future__ import annotations

import numpy as np

import jax


def init(coordinator: str | None = None, num_processes: int | None = None,
         process_id: int | None = None):
    """Initialize the distributed runtime. No-args form reads the standard
    env (JAX_COORDINATOR_ADDRESS etc.) or cloud TPU metadata; explicit args
    support localhost clusters and tests. Idempotent."""
    if getattr(init, "_done", False):
        return
    if coordinator is None and num_processes is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    init._done = True


def party_chunk_mesh(chunk: int | None = None):
    """Global (party=3, chunk=W) mesh over all processes' devices.

    Device order: jax.devices() is process-major, so with 3 (or 3k)
    processes the party axis lands on the process boundary — party traffic
    crosses DCN, chunk traffic stays on a host's ICI. With 1 process the
    same mesh is purely local (simulation layout)."""
    devs = jax.devices()
    n = len(devs)
    if n % 3:
        raise ValueError(f"need a multiple of 3 devices, got {n}")
    w = n // 3 if chunk is None else chunk
    if 3 * w > n:
        raise ValueError(f"mesh (3, {w}) exceeds {n} devices")
    grid = np.array(devs[: 3 * w]).reshape(3, w)
    return jax.sharding.Mesh(grid, ("party", "chunk"))


def share_spec(mesh, extra_dims: int = 2):
    """NamedSharding for a [3, N, 16] share stack: party x chunk x replicated
    limbs. ``extra_dims``: trailing dims after the party axis (N and limbs)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    party = "party" if "party" in mesh.shape else None
    chunk = "chunk" if "chunk" in mesh.shape and mesh.shape["chunk"] > 1 \
        else None
    parts = (party, chunk) + (None,) * (extra_dims - 1)
    return NamedSharding(mesh, P(*parts[: 1 + extra_dims]))


def replicate(x, mesh):
    """Place a host-identical value replicated across the global mesh.
    In multi-process SPMD every host computes the same public values; this
    makes them addressable inputs to global computations."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    arr = np.asarray(x)
    return jax.device_put(arr, NamedSharding(mesh, P()))


def place_shares(stack, mesh):
    """Shard a [3, ...] share stack: party axis over processes, element axis
    over each host's chips. ``stack`` must be host-identical (it is, in the
    single-controller model: shares derive from the shared PRG seeds)."""
    arr = np.asarray(stack)
    return jax.device_put(arr, share_spec(mesh, extra_dims=arr.ndim - 1))


def process_role() -> tuple[int, int]:
    """(process_id, num_processes) — party p == process p in the 3-host
    layout; used only for logging/artifact naming, never for control flow
    (the program is identical on every host)."""
    return jax.process_index(), jax.process_count()


def remesh(stack, mesh):
    """Re-place a share stack onto a DIFFERENT mesh (elastic resize).

    Partial-mesh story (replaces the reference's dummy-worker + subnet
    extend/trim machinery, mpc-net rep3/quic/coordinator.rs:610-634,
    co-spartan worker.rs:848-935): the protocol phases are mesh-agnostic
    global-view programs and Fiat-Shamir replay is deterministic, so after
    losing (or gaining) devices a prover re-places its global arrays on the
    surviving mesh and CONTINUES from the phase journal
    (utils/checkpoint.py) — no per-worker message schedule exists to keep
    aligned, which is why no dummy workers are needed. Exercised by
    tests/test_elastic.py."""
    return jax.device_put(stack, share_spec(mesh, extra_dims=stack.ndim - 1))
