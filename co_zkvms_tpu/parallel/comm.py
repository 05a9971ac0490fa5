"""Communication accounting for the MPC layer.

Maps mpc-net's per-connection bandwidth counters
(rep3/quic/coordinator.rs:256-305, worker.rs:225-241): the reference logs
udp_tx/udp_rx per phase with checkpoint/reset. In the TPU global-view
runtime there are no sockets — the ring messages are `ppermute`s along the
party mesh axis — so the equivalent observability is an account of the
bytes each Rep3 primitive moves across that axis (and to the host for
opens), recorded when the primitive is traced/executed.

Semantics: counters tick when the Python-level primitive runs. Inside a
jitted region that is trace time — i.e. the numbers are per-compiled-program
volumes, the static quantity a deployment planner needs (re-executions of a
compiled program move the same bytes). Use ``checkpoint()``/``delta()``
around a protocol phase to attribute volumes, like the reference's
``bandwidth checkpoint`` logs.
"""

from __future__ import annotations

import math
from collections import defaultdict

_ENABLED = False
_COUNTERS = defaultdict(int)
_CHECKPOINT = {}


def enable(on: bool = True):
    global _ENABLED
    _ENABLED = on


def reset():
    _COUNTERS.clear()
    _CHECKPOINT.clear()


def record(label: str, nbytes: int):
    if _ENABLED:
        _COUNTERS[label] += int(nbytes)


def _size_bytes(shape) -> int:
    n = 1
    for d in shape:
        n *= int(d)
    return 4 * n                      # u32 limbs/lanes


def record_reshare(shape_without_party):
    """One ring message per party: each sends its fresh additive share to
    next (rep3/arithmetic.rs:144-164) — per-party payload = share size."""
    record("ring_reshare", _size_bytes(shape_without_party))


def record_open(shape_without_party):
    """Open = send a-share to both neighbors (additive.rs:123-141)."""
    record("open", 2 * _size_bytes(shape_without_party))


def record_binary_and(shape_without_party):
    record("ring_reshare_binary", _size_bytes(shape_without_party))


def counters() -> dict:
    return dict(_COUNTERS)


def checkpoint():
    global _CHECKPOINT
    _CHECKPOINT = dict(_COUNTERS)


def delta() -> dict:
    return {k: v - _CHECKPOINT.get(k, 0) for k, v in _COUNTERS.items()
            if v - _CHECKPOINT.get(k, 0)}


def report(label: str = "") -> str:
    total = sum(_COUNTERS.values())
    lines = [f"comm[{label}] total {_fmt(total)}"]
    for k in sorted(_COUNTERS):
        lines.append(f"  {k}: {_fmt(_COUNTERS[k])}")
    return "\n".join(lines)


def _fmt(n: int) -> str:
    if n <= 0:
        return "0 B"
    units = ["B", "KiB", "MiB", "GiB"]
    k = min(len(units) - 1, int(math.log(n, 1024)))
    return f"{n / 1024 ** k:.2f} {units[k]}"
