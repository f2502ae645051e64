"""Pallas TPU kernels for the blind-rotation hot loop.

`rotate_decompose` fuses the per-step negacyclic monomial rotation (barrel
shifter), accumulator difference, and gadget decomposition into ONE VMEM-
resident pass: the XLA version makes log2(2N)+~4 HBM round-trips over the
(B, (k+1)N) int32 accumulator per step; this kernel reads the accumulator
once and writes the int8 digit matrix once, already in the (B, G*N) layout
the external-product matmul consumes.

Grid: one program per batch tile; all compute is VPU elementwise on VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import TfheParams
from . import decompose as dec


def _neg_roll_static(x: jax.Array, s: int, N: int) -> jax.Array:
    """X^s * p on a (Bt, N) VMEM block, static s in (0, N)."""
    y = pltpu.roll(x, s, axis=1)
    wrap = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) < s
    return jnp.where(wrap, -y, y)


def _rotate_block(x: jax.Array, amt: jax.Array, N: int) -> jax.Array:
    """Barrel rotation of a (Bt, N) block by per-row amt (Bt, 1) in [0, 2N)."""
    y = x
    for k in range(N.bit_length()):  # 1, 2, ..., N (s == N is negation)
        s = 1 << k
        rolled = -y if s == N else _neg_roll_static(y, s, N)
        bit = (amt >> k) & 1
        y = jnp.where(bit == 1, rolled, y)
    return y


def _rot_dec_kernel(amt_ref, acc_ref, out_ref, *, params: TfheParams):
    p = params
    N, k1, l = p.N, p.k + 1, p.l
    amt = amt_ref[:]  # (Bt, 1)
    off = jnp.uint32(np.uint32(dec.gadget_offset(p)))
    for u in range(k1):
        x = acc_ref[:, u * N:(u + 1) * N]
        diff = _rotate_block(x, amt, N) - x
        ud = diff.astype(jnp.uint32) + off
        for q in range(l):
            d = (ud >> (32 - (q + 1) * p.bgbit)) & (p.bg - 1)
            g = u * l + q
            out_ref[:, g * N:(g + 1) * N] = (
                d.astype(jnp.int32) - p.half_bg).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("params", "block", "interpret"))
def rotate_decompose(acc_flat: jax.Array, amt: jax.Array, params: TfheParams,
                     block: int = 256, interpret: bool = False) -> jax.Array:
    """Fused rotate+diff+decompose.

    acc_flat: (B, (k+1)*N) int32; amt: (B,) int32 in [0, 2N).
    Returns digits (B, (k+1)*l*N) int8, row-major in (component, level, coeff)
    -- exactly the external-product matmul LHS.
    """
    p = params
    B = acc_flat.shape[0]
    G = (p.k + 1) * p.l
    bt = min(block, B)
    assert B % bt == 0, (B, bt)
    grid = (B // bt,)
    return pl.pallas_call(
        functools.partial(_rot_dec_kernel, params=p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, (p.k + 1) * p.N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, G * p.N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G * p.N), jnp.int8),
        interpret=interpret,
    )(amt.reshape(B, 1), acc_flat)
