"""Preemption-safe proof checkpointing: resumable phase journal.

The reference has no mid-proof recovery (SURVEY.md §5 "no checkpoint-resume
of a running proof" — offline key artifacts only, cli/setup.rs:64-89). On
TPU this gap matters: production chips are preemptible and a 2^22-constraint
proof runs for minutes — losing the whole proof to a preemption is the
difference between "retry the job" and "ship the proof".

Design (TPU-first): a proof is a deterministic sequence of named phases,
each a pure function of the statement plus prior phases (Fiat-Shamir makes
the whole prover replay-deterministic). The journal records each completed
phase's result payload — host ints/proof fragments plus device arrays
(fetched once, stored as raw little-endian bytes) — under a statement
digest. On resume, completed phases load instantly (device arrays are
re-uploaded with jnp.asarray) and execution continues from the first
missing phase. A phase file is written atomically (tmp + rename) so a kill
mid-write never corrupts the journal.

Usage::

    ck = Checkpointer(dir, statement_digest)     # or Checkpointer.disabled()
    out = ck.phase("commit", lambda: {...})      # dict/tuple/arrays pytree
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import json
import os
from typing import Any, Callable

import numpy as np

MAGIC = "co_zkvms_tpu/ckpt/v1"


def _encode(obj: Any):
    # array leaves: jax arrays are fetched to host; stored dtype+shape+bytes
    if hasattr(obj, "__array__") and not isinstance(obj, (int, float, bool)):
        arr = np.asarray(obj)
        return {
            "__array__": base64.b64encode(arr.tobytes()).decode(),
            "dtype": str(arr.dtype),
            "shape": list(arr.shape),
        }
    if hasattr(obj, "_asdict"):
        return {"__namedtuple__": type(obj).__name__,
                "fields": {k: _encode(v) for k, v in obj._asdict().items()}}
    if isinstance(obj, dict):
        return {"__dict__": [[_encode(k), _encode(v)] for k, v in obj.items()]}
    if isinstance(obj, (list, tuple)):
        return {"__seq__": [_encode(v) for v in obj],
                "tuple": isinstance(obj, tuple)}
    if isinstance(obj, bytes):
        return {"__bytes__": base64.b64encode(obj).decode()}
    if isinstance(obj, bool) or obj is None or isinstance(obj, str):
        return obj
    if isinstance(obj, int):
        return {"__int__": str(obj)}
    raise TypeError(f"checkpoint: cannot serialize {type(obj)}")


def _decode(obj: Any, registry):
    if isinstance(obj, dict):
        if "__array__" in obj:
            raw = base64.b64decode(obj["__array__"])
            arr = np.frombuffer(raw, dtype=np.dtype(obj["dtype"]))
            arr = arr.reshape(obj["shape"])
            if obj["dtype"] == "uint32":
                import jax.numpy as jnp

                return jnp.asarray(arr)  # limb arrays go back to the device
            return arr
        if "__namedtuple__" in obj:
            cls = registry[obj["__namedtuple__"]]
            return cls(**{k: _decode(v, registry)
                          for k, v in obj["fields"].items()})
        if "__dict__" in obj:
            return {_hashable(_decode(k, registry)): _decode(v, registry)
                    for k, v in obj["__dict__"]}
        if "__seq__" in obj:
            seq = [_decode(v, registry) for v in obj["__seq__"]]
            return tuple(seq) if obj["tuple"] else seq
        if "__bytes__" in obj:
            return base64.b64decode(obj["__bytes__"])
        if "__int__" in obj:
            return int(obj["__int__"])
    return obj


def _hashable(x):
    return tuple(x) if isinstance(x, list) else x


def statement_digest(*parts) -> str:
    """Stable digest of the public statement (program words, srs seed, ...):
    resuming under a different statement must start a fresh journal."""
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:24]


class Checkpointer:
    """Phase journal under ``dir/<digest>/``. Pass None dir to disable."""

    def __init__(self, directory: str | None, digest: str = "default",
                 registry: dict | None = None):
        self.dir = None
        self.registry = registry or {}
        self.loaded = 0      # phases restored from disk (for tests/stats)
        self.computed = 0
        self._order = []     # phase names in call order (mismatch guard)
        if directory is not None:
            self.dir = os.path.join(directory, digest)
            os.makedirs(self.dir, exist_ok=True)

    @classmethod
    def disabled(cls):
        return cls(None)

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, f"{name}.ckpt.gz")

    def phase(self, name: str, fn: Callable[[], Any]) -> Any:
        """Return the phase's result, from the journal if already complete."""
        assert name not in self._order, f"duplicate phase name {name!r}"
        self._order.append(name)
        if self.dir is None:
            self.computed += 1
            return fn()
        path = self._path(name)
        if os.path.exists(path):
            with gzip.open(path, "rt") as f:
                blob = json.load(f)
            if blob.get("magic") == MAGIC and blob.get("phase") == name:
                self.loaded += 1
                return _decode(blob["payload"], self.registry)
        result = fn()
        self.computed += 1
        blob = {"magic": MAGIC, "phase": name, "payload": _encode(result)}
        tmp = path + ".tmp"
        with gzip.open(tmp, "wt") as f:
            json.dump(blob, f)
        os.replace(tmp, path)  # atomic: a preemption mid-write is harmless
        return result

    def clear(self):
        if self.dir is None:
            return
        for f in os.listdir(self.dir):
            if f.endswith(".ckpt.gz"):
                os.remove(os.path.join(self.dir, f))
