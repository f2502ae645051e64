"""Bit-slicing helpers: integers <-> LSB-first bit tensors.

The reference bit-slices by hand at every call site
(/root/reference/src/main.cpp:62-68, 76-85); here it is one vectorized
transform.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def int_to_bits(values, nbits: int) -> jnp.ndarray:
    """(...,) ints -> (..., nbits) int32 bits, LSB first."""
    v = np.asarray(values, np.int64)
    return jnp.asarray(((v[..., None] >> np.arange(nbits)) & 1).astype(np.int32))


def bits_to_int(bits) -> np.ndarray:
    """(..., nbits) bits -> (...,) int64, LSB first."""
    b = np.asarray(bits).astype(np.int64)
    return (b << np.arange(b.shape[-1])).sum(axis=-1)
