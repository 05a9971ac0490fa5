"""Proof/key serialization: canonical JSON with format tags + gzip.

Maps noir-r1cs's tagged file I/O (file/{mod,bin,json}.rs: json / bin / gz
variants with a format header) for proofs, verifier keys and artifacts.
Everything we serialize is ints/tuples/lists (proof objects are host-side
NamedTuples of ints), so JSON is canonical and diff-able; gzip for bulk.
"""

from __future__ import annotations

import gzip
import json
from typing import Any

MAGIC = "co_zkvms_tpu/v1"


def _encode(obj: Any):
    if hasattr(obj, "_asdict"):
        return {"__namedtuple__": type(obj).__name__,
                "fields": {k: _encode(v) for k, v in obj._asdict().items()}}
    if isinstance(obj, dict):
        return {"__dict__": [[_encode(k), _encode(v)] for k, v in obj.items()]}
    if isinstance(obj, (list, tuple)):
        return {"__seq__": [_encode(v) for v in obj],
                "tuple": isinstance(obj, tuple)}
    if isinstance(obj, int):
        return {"__int__": str(obj)}  # ints may exceed JSON float precision
    if obj is None or isinstance(obj, (str, bool)):
        return obj
    raise TypeError(f"cannot serialize {type(obj)}")


def _decode(obj: Any, registry):
    if isinstance(obj, dict):
        if "__namedtuple__" in obj:
            cls = registry[obj["__namedtuple__"]]
            return cls(**{k: _decode(v, registry)
                          for k, v in obj["fields"].items()})
        if "__dict__" in obj:
            return {
                _hashable(_decode(k, registry)): _decode(v, registry)
                for k, v in obj["__dict__"]
            }
        if "__seq__" in obj:
            seq = [_decode(v, registry) for v in obj["__seq__"]]
            return tuple(seq) if obj.get("tuple") else seq
        if "__int__" in obj:
            return int(obj["__int__"])
    return obj


def _hashable(x):
    return tuple(x) if isinstance(x, list) else x


def dump(obj, path: str):
    payload = {"magic": MAGIC, "data": _encode(obj)}
    raw = json.dumps(payload).encode()
    if path.endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(raw)
    else:
        with open(path, "wb") as f:
            f.write(raw)


def load(path: str, registry=None):
    """``registry``: dict name -> NamedTuple class for reconstruction."""
    if registry is None:
        registry = _default_registry()
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        payload = json.loads(f.read())
    if payload.get("magic") != MAGIC:
        raise ValueError("bad file magic")
    return _decode(payload["data"], registry)


def _default_registry():
    from ..models.spartan import SpartanProof
    from ..models.spartan_dfs import DFSRoundProof
    from ..ops.pst13 import Commitment, OpeningProof
    from ..ops.grand_product import GrandProductProof

    return {
        c.__name__: c
        for c in (SpartanProof, DFSRoundProof, Commitment, OpeningProof,
                  GrandProductProof)
    }
