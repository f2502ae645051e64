"""Atomic JSON artifact writes for benchmark/diagnostic scripts.

Benchmark artifacts double as checkpoints (scripts rewrite them
incrementally so a crash keeps the rows measured so far); a plain
open+json.dump truncates the file first, so a kill mid-dump loses exactly
the progress the checkpoint exists to protect.  Same tmp+os.replace
pattern as sweep.py's chunk checkpoints.
"""

from __future__ import annotations

import json
import os


def atomic_json(path: str, obj, indent: int | None = 1) -> None:
    """Write `obj` as JSON to `path` atomically (tmp file + rename)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=indent)
    os.replace(tmp, path)
