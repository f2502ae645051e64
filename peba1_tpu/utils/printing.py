"""Debug printing helpers -- equivalents of the reference's C17
(printVector /root/reference/src/Client.cpp:6-16, printVect64 :17-28 [dead],
printSlot64 /root/reference/src/Math.cpp:11-19)."""

from __future__ import annotations

import numpy as np


def print_vector(v, size: int | None = None) -> str:
    """Mirror of printVector: '[ v0 v1 ... ]' over uint8-ish values."""
    v = np.asarray(v).reshape(-1)
    if size is not None:
        v = v[:size]
    s = "[ " + " ".join(str(int(x)) for x in v) + " ]"
    print(s)
    return s


def print_vect64(v, length: int | None = None) -> str:
    """Mirror of printVect64 (dead code in the reference, still exported)."""
    return print_vector(np.asarray(v, np.uint64), length)


def print_slot64(n: int) -> str:
    """Mirror of printSlot64: '[unsigned signed bits-lsb-first]'."""
    u = int(np.uint64(n))
    s = int(np.int64(np.uint64(n)))
    bits = "".join(str((u >> i) & 1) for i in range(64))
    out = f"[{u} {s} {bits}]"
    print(out, end="")
    return out
