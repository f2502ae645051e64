"""Torus32 arithmetic helpers.

The real torus T = R/Z is represented by int32 with the natural scaling
t = round(x * 2^32); addition/negation wrap natively mod 2^32 (SURVEY.md E2).
The reference consumes this representation through the external TFHE library's
``Torus32`` typedef (used at /root/reference/src/Math.cpp:253).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TORUS_DTYPE = jnp.int32
_TWO32 = 2.0**32


def double_to_torus32(x) -> jax.Array:
    """Map a real number (mod 1) to torus32."""
    frac = jnp.asarray(x, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    frac = frac - jnp.floor(frac)
    # Map [0,1) -> [0, 2^32) -> wrap to int32 via uint32.
    u = jnp.uint32(jnp.round(frac * _TWO32) % _TWO32)
    return u.astype(jnp.int32)


def modswitch_to_torus32(mu: int, msize: int) -> int:
    """Exact integer version of TFHE's modSwitchToTorus32 (python ints).

    Returns the torus32 encoding of mu/msize, e.g. (1, 8) -> 2^29.
    """
    interval = ((1 << 63) // msize) * 2  # 2^64 / msize
    phase64 = (mu * interval) % (1 << 64)
    # Round to nearest multiple of 2^32 and keep the high 32 bits.
    t = ((phase64 + (1 << 31)) >> 32) & 0xFFFFFFFF
    return int(np.int64(t).astype(np.int32))


def torus32_to_double(t) -> jax.Array:
    """Map torus32 back to a real in [-1/2, 1/2)."""
    return jnp.asarray(t, jnp.int32).astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32) / _TWO32


def gaussian_torus32(key: jax.Array, stdev: float, shape) -> jax.Array:
    """Sample torus32 gaussian noise with the given stdev (fraction of torus).

    Deterministic in the PRNG key -- replaces the reference's time(NULL)
    seeding (SURVEY.md section 4) with reproducible keyed sampling.
    """
    if stdev == 0.0:
        return jnp.zeros(shape, jnp.int32)
    g = jax.random.normal(key, shape, dtype=jnp.float32) * (stdev * _TWO32)
    # Round to nearest int; wrap into int32 range. float32 noise resolution is
    # ample: stdev*2^32 <= 2^17 for all presets, well within float32 exactness.
    return jnp.round(g).astype(jnp.int64).astype(jnp.int32) if jax.config.jax_enable_x64 else _wrap_f32(g)


def _wrap_f32(g: jax.Array) -> jax.Array:
    # Round float32 to int32 with wrap-around (values are small; no overflow
    # in practice, but keep a defined behavior via modular fold).
    r = jnp.round(g)
    r = r - jnp.floor(r / _TWO32) * _TWO32  # into [0, 2^32)
    r = jnp.where(r >= 2.0**31, r - _TWO32, r)
    return r.astype(jnp.int32)


def uniform_torus32(key: jax.Array, shape) -> jax.Array:
    """Uniform torus32 elements (for LWE/TRLWE masks)."""
    bits = jax.random.bits(key, shape, dtype=jnp.uint32)
    return bits.astype(jnp.int32)


def approx_phase(phase: jax.Array, msize: int) -> jax.Array:
    """Round a torus32 phase to the nearest multiple of 1/msize (approxPhase)."""
    interval = np.uint32((1 << 32) // msize)
    half = np.uint32(interval // 2)
    u = phase.astype(jnp.uint32) + half
    u = u - (u % interval)
    return u.astype(jnp.int32)
