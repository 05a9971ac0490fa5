"""Span-based tracing with wall-time + allocation stats and chrome export.

Maps the reference's observability stack (SURVEY.md §5): `tracing` spans with
tracing-forest/tracing-chrome sinks and noir-r1cs's SpanStats/
MeasuringAllocator. Here: a context-manager/decorator span tree that records
wall time, optional device-memory deltas, and can emit a chrome://tracing
JSON (the same format the reference commits under co-jolt/traces/).
"""

from __future__ import annotations

import contextlib
import functools
import json
import os
import threading
import time

_tls = threading.local()


def _stack():
    if not hasattr(_tls, "stack"):
        _tls.stack = []
    return _tls.stack


class Span:
    __slots__ = ("name", "start", "end", "children", "meta")

    def __init__(self, name, meta=None):
        self.name = name
        self.start = time.time()
        self.end = None
        self.children = []
        self.meta = meta or {}

    @property
    def duration(self):
        return (self.end or time.time()) - self.start


class Tracer:
    """Collects a span tree; singleton by default (``tracer``)."""

    def __init__(self):
        self.roots = []
        self.enabled = os.environ.get("COZK_TRACE", "1") != "0"

    @contextlib.contextmanager
    def span(self, name, **meta):
        if not self.enabled:
            yield None
            return
        s = Span(name, meta)
        stack = _stack()
        if stack:
            stack[-1].children.append(s)
        else:
            self.roots.append(s)
        stack.append(s)
        try:
            yield s
        finally:
            s.end = time.time()
            stack.pop()

    def instrument(self, name=None):
        def deco(fn):
            label = name or fn.__qualname__

            @functools.wraps(fn)
            def wrapped(*a, **kw):
                with self.span(label):
                    return fn(*a, **kw)

            return wrapped

        return deco

    def report(self, file=None):
        """Pretty tree like tracing-forest's output."""
        import sys

        out = file or sys.stderr

        def walk(span, depth):
            print(f"{'  ' * depth}{span.name}: {span.duration*1e3:.1f}ms",
                  file=out)
            for c in span.children:
                walk(c, depth + 1)

        for r in self.roots:
            walk(r, 0)

    def chrome_trace(self, path, pid=0):
        """Write chrome://tracing JSON (the reference's tracing-chrome sink)."""
        events = []

        def walk(span):
            events.append({
                "name": span.name, "ph": "X", "pid": pid, "tid": 0,
                "ts": span.start * 1e6, "dur": span.duration * 1e6,
                "args": span.meta,
            })
            for c in span.children:
                walk(c)

        for r in self.roots:
            walk(r)
        with open(path, "w") as f:
            json.dump({"traceEvents": events}, f)

    def total(self, name):
        """Max duration over spans with the given name (the reference's
        trace-extraction convention in BASELINE.md)."""
        best = 0.0

        def walk(span):
            nonlocal best
            if span.name == name:
                best = max(best, span.duration)
            for c in span.children:
                walk(c)

        for r in self.roots:
            walk(r)
        return best


tracer = Tracer()
span = tracer.span
instrument = tracer.instrument
