"""Timestamp range checking (co-jolt's timestamp_range_check).

Capability parity: `co-jolt/src/jolt/vm/timestamp_range_check.rs:14-56`
(``read_cts_read_timestamp``, ``read_cts_global_minus_read``,
``final_cts_read_timestamp``, ``final_cts_global_minus_read``,
``identity``) — the Spice-style proof that RAM read timestamps respect
causality: for every step j, ``read_ts[j] <= j``.

Construction (same as the reference / jolt-core): both ``read_ts[j]`` and
``j - read_ts[j]`` are looked up in the **identity table** I[a] = a of size
T = the (padded) trace length; offline memory checking over a read-only
table forces every looked-up address into [0, T) — an address outside the
table's domain can never cancel against the init/final multisets. The two
checks together give 0 <= read_ts[j] and read_ts[j] <= j < T.

TPU-first formulation: rather than a bespoke prover, a range check IS a
read-only memory instance whose *address column is the checked column* and
whose image is the identity table — so it rides the exact batched-GKR +
PST13 pipeline of `rw_memory.py` (same kernels, same proof object, same
verifier). The identity image MLE additionally has a closed form
sum_b 2^b rho_b, which the verifier uses instead of the O(T) generic
init-image fold.

NOTE on when this is needed: the default provers in this package use
per-address increment-by-one counters (Lasso/Spice "local counts"), whose
multiset argument is sound without a separate range check for any trace
length << field characteristic. The range check becomes load-bearing for
the reference's *global*-timestamp RAM semantics, and is exposed here both
for that mode and as a general committed-column range gadget.
"""

from __future__ import annotations

from . import rw_memory as RW

__all__ = [
    "timestamp_columns",
    "range_check_traces",
    "prove",
    "verify",
    "identity_eval",
]


def timestamp_columns(read_ts):
    """The two checked columns of the reference proof, by its names.

    ``read_ts``: ints, read_ts[j] = global timestamp of the last write to
    the address step j reads (0 for first reads). Both columns must land in
    [0, T): the first by causality, the second because read_ts[j] <= j.
    """
    for j, t in enumerate(read_ts):
        if not 0 <= t <= j:
            raise ValueError(f"read_ts[{j}]={t} violates causality")
    return {
        "read_timestamp": list(read_ts),
        "global_minus_read": [j - t for j, t in enumerate(read_ts)],
    }


def range_check_traces(cols: dict, t_bits: int):
    """Checked columns -> read-only identity-table memory traces.

    ``cols``: name -> list of ints, each claimed to lie in [0, 2^t_bits).
    Every lookup is a read-modify-write that writes the value back
    (read-only semantics); the init image is the identity table.
    """
    ident = list(range(1 << t_bits))
    traces = []
    for name, vals in cols.items():
        ops = [(v, v, v) for v in vals]
        traces.append(
            RW.MemoryTrace(
                name=f"ts_{name}", mem_bits=t_bits, ops=ops, init_vals=ident
            )
        )
    return traces


def prove(read_ts, srs, t_bits: int | None = None):
    """Prove read_ts[j] <= j for all j. Returns (proof, instances).

    ``instances`` is the public statement to hand to ``verify``.
    """
    n = len(read_ts)
    if t_bits is None:
        t_bits = max(2, (n - 1).bit_length())
    cols = timestamp_columns(read_ts)
    traces = range_check_traces(cols, t_bits)
    wits = [RW.build_witness(tr) for tr in traces]
    proof = RW.prove(wits, srs)
    instances = [(w.name, w.mem_bits, w.init_vals) for w in wits]
    return proof, instances


def verify(proof, instances, srs) -> bool:
    """Verify a range-check proof: plain rw_memory verification. The
    statement "column in [0, 2^t_bits)" holds iff the instance's init
    image is the identity table (checked here) and the memory proof
    verifies."""
    for _, mem_bits, init_vals in instances:
        if init_vals != list(range(1 << mem_bits)):
            return False
    return RW.verify(proof, instances, srs)


def identity_eval(rho, mem_bits: int) -> int:
    """Closed form of the identity-table MLE at rho: sum_b 2^b * rho_b."""
    from ...ops.field import FR

    return sum((1 << b) * rho[b] for b in range(mem_bits)) % FR.modulus
