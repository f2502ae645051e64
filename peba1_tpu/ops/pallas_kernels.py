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


def _decompose_block(diff: jax.Array, p: TfheParams) -> list:
    """Gadget digits of a (Bt, N) int32 block -> l int8 blocks."""
    off = jnp.uint32(np.uint32(dec.gadget_offset(p)))
    ud = diff.astype(jnp.uint32) + off
    outs = []
    for q in range(p.l):
        d = (ud >> (32 - (q + 1) * p.bgbit)) & (p.bg - 1)
        outs.append((d.astype(jnp.int32) - p.half_bg).astype(jnp.int8))
    return outs


def _fused_cmux_kernel(amt_ref, vv_ref, acc_in_ref, out_ref, d_ref, a_ref,
                       *, params: TfheParams, plan, fine: int):
    """One (batch-tile, step) grid cell of the fused blind rotation.

    Per step: rotate+diff+decompose the VMEM-resident accumulator, build the
    negacyclic-Toeplitz weight tiles from the step's doubled generator with
    in-VMEM slice copies, run U int8 MXU dots per output column-poly, fold
    the limb recombination into the epilogue, accumulate into out_ref.

    vv_ref: (1, G, C, 2N) int8 this step's doubled limb generator.
    acc_in/out: (Bt, (k+1)*N) int32; out_ref doubles as the resident acc
    (same block for every step of a batch tile -> stays in VMEM).
    a_ref: (G, C, K, span) int8 scratch (fine-shift stage; K and span last
    so the int8 (32, 128) tiling pads only the small G, C leading dims).
    d_ref: (Bt, G*N) int8 scratch (digits).
    """
    p = params
    N, k1, l = p.N, p.k + 1, p.l
    G = k1 * l
    K = fine
    U = N // K
    span = N + (U - 1) * K
    base = N - (U - 1) * K
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        out_ref[:] = acc_in_ref[:]

    amt = amt_ref[:, pl.ds(s, 1)]  # (Bt, 1) -- this step's rotation amounts
    # --- rotate + diff + decompose into d_ref ----------------------------
    for u in range(k1):
        x = out_ref[:, u * N:(u + 1) * N]
        diff = _rotate_block(x, amt, N) - x
        for q, dq in enumerate(_decompose_block(diff, p)):
            g = u * l + q
            d_ref[:, g * N:(g + 1) * N] = dq

    # --- fine-shift stage: a_ref[g, c, kappa, j] = vv[g, c, base-kappa+j] -
    for kappa in range(K):
        a_ref[:, :, kappa, :] = vv_ref[0, :, :, base - kappa: base - kappa + span]

    # --- U dots per column-poly c, limb-recombine into the accumulator ---
    d = d_ref[:].reshape(-1, G, N)
    c0 = 0
    for o, nl in enumerate(plan):
        delta_o = None
        for m in range(nl):
            c = c0 + m
            shift = 8 * (4 - nl) + 8 * m
            out_c = None
            for u in range(U):
                lhs = d[:, :, u * K:(u + 1) * K].reshape(-1, G * K)
                off_u = (U - 1 - u) * K
                rhs = a_ref[:, c, :, off_u: off_u + N].reshape(G * K, N)
                acc = jax.lax.dot_general(
                    lhs, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out_c = acc if out_c is None else out_c + acc
            term = out_c << shift
            delta_o = term if delta_o is None else delta_o + term
        out_ref[:, o * N:(o + 1) * N] += delta_o
        c0 += nl


@functools.partial(jax.jit, static_argnames=("params", "block", "fine", "interpret"))
def fused_blind_rotate(acc_flat: jax.Array, bara_t: jax.Array, vv_steps: jax.Array,
                       params: TfheParams, block: int = 128, fine: int = 128,
                       interpret: bool = False) -> jax.Array:
    """Full blind rotation as ONE Pallas kernel.

    acc_flat: (B, (k+1)*N) int32 initial accumulator (testvector rotated by
      the body phase); bara_t: (B, n) int32 per-step rotation amounts;
    vv_steps: (n, G, C, 2N) int8 doubled limb generators (CloudKey.bk_tp).
    Returns the final accumulator (B, (k+1)*N) int32.

    The accumulator block stays resident in VMEM across all n steps of a
    batch tile (grid = (B/block, n), step-major inner): per step the only
    HBM traffic is the G*C*2N generator block (~56 KB) -- no W
    materialization, no digit round-trips, no accumulator round-trips.
    """
    p = params
    plan = p.limb_plan
    B = acc_flat.shape[0]
    n_steps, G, C, n2 = vv_steps.shape
    N = p.N
    bt = min(block, B)
    assert B % bt == 0, (B, bt)
    K = min(fine, N)
    U = N // K
    span = N + (U - 1) * K
    grid = (B // bt, n_steps)
    # The amt block must satisfy TPU tiling (last dim 128-divisible): keep
    # the full padded (bt, n_pad) row-block resident and slice per step.
    n_pad = -(-n_steps // 128) * 128
    bara_t = jnp.pad(bara_t, ((0, 0), (0, n_pad - n_steps)))
    kernel = functools.partial(
        _fused_cmux_kernel, params=p, plan=plan, fine=K)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, n_pad), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, C, n2), lambda i, s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, (p.k + 1) * N), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, (p.k + 1) * N), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, (p.k + 1) * N), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bt, G * N), jnp.int8),
            pltpu.VMEM((G, C, K, span), jnp.int8),
        ],
        interpret=interpret,
    )(bara_t, vv_steps, acc_flat)


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
