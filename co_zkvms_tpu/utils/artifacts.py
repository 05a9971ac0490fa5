"""Per-(party, chunk) offline key & witness artifacts for multi-host runs.

Maps the reference's chunked setup/witness distribution
(co-noir-spartan/co-spartan/src/setup.rs:82-176 ``split_ipk`` writes
``worker_{i}.key`` slices; witness.rs:21-58 streams per-worker witness
shares): a deployment at 2^22+ constraints must NOT re-materialize full
tables on every host. Here:

- ``write_spartan_setup`` partitions the R1CS COO arrays into row-range
  chunks (padded to a common nnz so the chunk axis shards evenly) and
  writes one ``.npz`` per chunk;
- ``write_witness_shares`` uses SEEDED share compression
  (parallel/shares.py, maps mpc-types rep3.rs:34-174 SeededType): parties
  0 and 1 receive a 32-byte PRG key each (expanded per chunk on device via
  ``fold_in(key, chunk)``), only party 2's share is written explicitly,
  sliced per chunk — distributing a witness costs 1/3 of the naive bytes
  on the wire/disk, killing the reference's 297 s streaming wall;
- the ``load_*`` functions build GLOBAL sharded arrays with
  ``jax.make_array_from_callback``: each jax.distributed process executes
  the callback only for its ADDRESSABLE shards, so a host touches exactly
  its (party, chunk) files/seeds — no process materializes a full table.
  Loaded/expanded bytes are accounted in parallel/comm.py under
  ``artifact_load`` / ``seed_expand``.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops.field import FR
from ..parallel import comm


def _chunk_bounds(n: int, n_chunks: int, c: int):
    per = n // n_chunks
    return c * per, (c + 1) * per if c < n_chunks - 1 else n


def write_spartan_setup(dirpath, index, n_chunks: int):
    """Partition the index matrices into per-chunk row-range COO slices.

    Chunk c of matrix M holds the entries whose ROW falls in c's range of
    [0, 2^nv); all chunks are zero-padded to the max per-chunk nnz so the
    concatenated arrays shard evenly on the chunk mesh axis."""
    os.makedirs(dirpath, exist_ok=True)
    n = 1 << index.nv
    meta = {"nv": index.nv, "n_chunks": n_chunks, "pad_nnz": {}}
    for name, dm in (("a", index.da), ("b", index.db), ("c", index.dc)):
        rows = np.asarray(jax.device_get(dm.rows))
        cols = np.asarray(jax.device_get(dm.cols))
        vals = np.asarray(jax.device_get(dm.vals))
        order = np.argsort(rows, kind="stable")
        rows, cols, vals = rows[order], cols[order], vals[order]
        starts = [np.searchsorted(rows, _chunk_bounds(n, n_chunks, c)[0])
                  for c in range(n_chunks)] + [len(rows)]
        pad = max(1, max(starts[c + 1] - starts[c]
                         for c in range(n_chunks)))
        meta["pad_nnz"][name] = int(pad)
        for c in range(n_chunks):
            lo, hi = starts[c], starts[c + 1]
            r = np.zeros(pad, np.int32)
            cl = np.zeros(pad, np.int32)
            v = np.zeros((pad, F.NLIMBS), np.uint32)  # val 0 = no-op entry
            r[: hi - lo] = rows[lo:hi]
            cl[: hi - lo] = cols[lo:hi]
            v[: hi - lo] = vals[lo:hi]
            np.savez(os.path.join(dirpath, f"{name}_chunk{c}.npz"),
                     rows=r, cols=cl, vals=v)
    with open(os.path.join(dirpath, "meta.json"), "w") as fh:
        json.dump(meta, fh)


def write_witness_shares(dirpath, index, z_ints, key, n_chunks: int):
    """Seeded per-chunk witness share artifacts.

    Party 0/1: one PRG key each (share of chunk c = F.random(fold_in(k_p,
    c))). Party 2: explicit per-chunk slices. The public io segment is
    written once (it is replicated)."""
    from ..models import co_spartan

    os.makedirs(dirpath, exist_ok=True)
    r1cs = index.r1cs
    zp = r1cs.pad_z(z_ints)
    io_ints, w_ints = r1cs.split_io_w(zp)
    n = 1 << index.nv
    k0, k1 = jax.random.split(key)
    w_dev = F.from_int(FR, w_ints)
    np.savez(os.path.join(dirpath, "io.npz"),
             io=np.asarray(jax.device_get(F.from_int(FR, io_ints))))
    for p, kp in ((0, k0), (1, k1)):
        np.savez(os.path.join(dirpath, f"party{p}_seed.npz"),
                 key_data=np.asarray(jax.random.key_data(kp)))
    # party 2 = w - r0 - r1, computed and written per chunk
    for c in range(n_chunks):
        lo, hi = _chunk_bounds(n, n_chunks, c)
        r0 = F.random(FR, jax.random.fold_in(k0, c), (hi - lo,))
        r1 = F.random(FR, jax.random.fold_in(k1, c), (hi - lo,))
        s2 = F.sub(FR, F.sub(FR, w_dev[lo:hi], r0), r1)
        np.savez(os.path.join(dirpath, f"party2_chunk{c}.npz"),
                 share=np.asarray(jax.device_get(s2)))
    with open(os.path.join(dirpath, "wmeta.json"), "w") as fh:
        json.dump({"nv": index.nv, "n_chunks": n_chunks}, fh)


def _callback_array(shape, sharding, cb):
    return jax.make_array_from_callback(shape, sharding, cb)


def load_witness_shares(dirpath, mesh):
    """Global [3, N, 16] Rep3 witness-share array; each process expands or
    loads ONLY its addressable (party, chunk) shards. Returns (io_table,
    z_shares, w_shares)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import shares as Sh

    with open(os.path.join(dirpath, "wmeta.json")) as fh:
        meta = json.load(fh)
    n = 1 << meta["nv"]
    n_chunks = meta["n_chunks"]
    seeds = {}
    for p in (0, 1):
        with np.load(os.path.join(dirpath, f"party{p}_seed.npz")) as z:
            seeds[p] = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))

    party = "party" if "party" in mesh.shape else None
    spec = NamedSharding(mesh, P(party, "chunk", None))

    def cb(idx):
        p_sl, e_sl, _ = idx
        p_lo = p_sl.start or 0
        p_hi = p_sl.stop if p_sl.stop is not None else 3
        lo = e_sl.start or 0
        hi = e_sl.stop if e_sl.stop is not None else n
        per = n // n_chunks
        parts = []
        for p in range(p_lo, p_hi):
            rows = []
            c0, c1 = lo // per, (hi + per - 1) // per
            for c in range(c0, c1):
                clo, chi = _chunk_bounds(n, n_chunks, c)
                if p in (0, 1):
                    comm.record("seed_expand", (chi - clo) * 64)
                    rows.append(F.random(
                        FR, jax.random.fold_in(seeds[p], c), (chi - clo,)))
                else:
                    comm.record("artifact_load", (chi - clo) * 64)
                    with np.load(os.path.join(
                            dirpath, f"party2_chunk{c}.npz")) as z:
                        rows.append(jnp.asarray(z["share"]))
            block = jnp.concatenate(rows, axis=0)
            s = lo - c0 * per
            parts.append(block[s: s + (hi - lo)])
        return jnp.stack(parts, axis=0)

    w_shares = _callback_array((3, n, F.NLIMBS), spec, cb)
    with np.load(os.path.join(dirpath, "io.npz")) as z:
        io_table = jnp.asarray(z["io"])
    comm.record("artifact_load", int(io_table.shape[0]) * 64)
    z_shares = F.add(FR, Sh.promote_public(FR, io_table), w_shares)
    return io_table, z_shares, w_shares


def load_spartan_setup(dirpath, mesh, r1cs=None):
    """Rebuild a SpartanIndex whose COO arrays are GLOBAL arrays sharded on
    the chunk axis; each process loads only its chunk files. ``r1cs`` is
    the host-side matrix container (public; only needed for the host
    verifier — pass None for a pure prover process)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.r1cs import DeviceMatrix
    from ..models.spartan import SpartanIndex

    with open(os.path.join(dirpath, "meta.json")) as fh:
        meta = json.load(fh)
    nv, n_chunks = meta["nv"], meta["n_chunks"]
    n = 1 << nv
    dms = {}
    for name in ("a", "b", "c"):
        pad = meta["pad_nnz"][name]
        total = pad * n_chunks

        def cb1(idx, name=name, pad=pad):
            (sl,) = idx
            lo = sl.start or 0
            hi = sl.stop if sl.stop is not None else total
            out_r, out_c = [], []
            for c in range(lo // pad, (hi + pad - 1) // pad):
                comm.record("artifact_load", pad * 8)
                with np.load(os.path.join(
                        dirpath, f"{name}_chunk{c}.npz")) as z:
                    out_r.append(z["rows"])
                    out_c.append(z["cols"])
            rr = np.concatenate(out_r)
            cc = np.concatenate(out_c)
            s = lo - (lo // pad) * pad
            return (jnp.asarray(rr[s: s + hi - lo]),
                    jnp.asarray(cc[s: s + hi - lo]))

        def cb_rows(idx):
            return cb1(idx)[0]

        def cb_cols(idx):
            return cb1(idx)[1]

        def cb_vals(idx, name=name, pad=pad):
            sl = idx[0]
            lo = sl.start or 0
            hi = sl.stop if sl.stop is not None else total
            out = []
            for c in range(lo // pad, (hi + pad - 1) // pad):
                comm.record("artifact_load", pad * 64)
                with np.load(os.path.join(
                        dirpath, f"{name}_chunk{c}.npz")) as z:
                    out.append(z["vals"])
            vv = np.concatenate(out)
            s = lo - (lo // pad) * pad
            return jnp.asarray(vv[s: s + hi - lo])

        spec1 = NamedSharding(mesh, P("chunk"))
        spec2 = NamedSharding(mesh, P("chunk", None))
        dms[name] = DeviceMatrix(
            rows=_callback_array((total,), spec1, cb_rows),
            cols=_callback_array((total,), spec1, cb_cols),
            vals=_callback_array((total, F.NLIMBS), spec2, cb_vals),
            n_rows=n, n_cols=n,
        )
    return SpartanIndex(r1cs=r1cs, nv=nv, da=dms["a"], db=dms["b"],
                        dc=dms["c"])
