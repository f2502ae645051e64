"""Structured logging / metrics -- SURVEY.md section 5 observability row.

The reference interleaves printf timing with results on stdout
(/root/reference/src/main.cpp:44-49,308,323-328; helpers src/Client.cpp:6-28).
This module replaces that with machine-readable JSON-lines events: every
event is one line `{"ts": ..., "event": ..., **fields}` written to a stream
and/or file, so benchmark harnesses and the driver emit logs that tooling can
consume directly (the BASELINE.json metrics story).

Dependency-free; safe under jit tracing (never touches array values).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import IO, Iterator, Optional


class EventLog:
    """JSON-lines event emitter with wall-clock timers and counters."""

    def __init__(self, stream: Optional[IO[str]] = None, path: Optional[str] = None,
                 context: Optional[dict] = None):
        self._stream = stream
        self._file = open(path, "a") if path else None
        self._owns_file = self._file is not None
        self._context = dict(context or {})
        self.counters: dict[str, float] = {}

    def close(self) -> None:
        # Children share the parent's handle but do not own it: closing a
        # child must not kill the parent's sink (or vice versa).
        if self._file is not None and self._owns_file:
            self._file.close()
        self._file = None

    def log(self, event: str, **fields) -> dict:
        rec = {"ts": round(time.time(), 6), "event": event, **self._context, **fields}
        line = json.dumps(rec, default=_jsonable)
        for out in (self._stream, self._file):
            # A parent may close the shared file handle while children still
            # hold it; logging through a closed sink degrades to a no-op
            # rather than raising inside the caller's (often `finally`) path.
            if out is not None and not getattr(out, "closed", False):
                out.write(line + "\n")
                out.flush()
        return rec

    def count(self, name: str, delta: float = 1.0) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + delta

    @contextlib.contextmanager
    def timer(self, event: str, **fields) -> Iterator[dict]:
        """Times a block; emits `{event}` with `seconds` on exit.

        Yields a dict the block may stuff extra fields into (they are merged
        into the emitted event).
        """
        extra: dict = {}
        t0 = time.perf_counter()
        try:
            yield extra
        finally:
            dt = time.perf_counter() - t0
            # Dict-merge (extra wins) instead of **fields, **extra: a block
            # writing a key that collides with a timer kwarg must not raise
            # TypeError inside finally and mask the original exception.
            self.log(event, **{"seconds": round(dt, 6), **fields, **extra})

    def child(self, **context) -> "EventLog":
        """Same sinks, extra bound context fields (handle stays parent-owned)."""
        c = EventLog(stream=self._stream, context={**self._context, **context})
        c._file = self._file
        c._owns_file = False
        return c


def _jsonable(x):
    try:
        import numpy as np

        if isinstance(x, np.generic):
            return x.item()
        if isinstance(x, np.ndarray):
            return x.tolist()
    except Exception:
        pass
    return str(x)


NULL_LOG = EventLog()  # no sinks: all calls are cheap no-ops


def stderr_log(**context) -> EventLog:
    return EventLog(stream=sys.stderr, context=context)
