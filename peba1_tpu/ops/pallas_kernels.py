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
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import TfheParams
from . import decompose as dec


def _fit_block(B: int, want: int) -> int:
    """Largest batch-tile size that divides B and is <= want (>= 1).

    Batch tiling requires bt | B; rather than hard-failing on e.g. B=192
    with a 128 block, degrade to the nearest dividing tile.
    """
    bt = max(1, min(want, B))
    while B % bt:
        bt -= 1
    return bt


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


def _fused_cmux_kernel(mu_ref, amt_ref, a_ref, out_ref, d_ref,
                       *, params: TfheParams, plan, fine: int):
    """One (batch-tile, step) grid cell of the fused blind rotation.

    Per cell: rotate+diff+decompose the VMEM-resident accumulator into the
    digit scratch (at s == 0 first initializing acc = [0 | X^{-barb} * tv]
    in-kernel from amt column 0), then loop the C limb columns statically:
    U int8 MXU dots of the digit tile against the column's precomputed
    fine-shift weights, shifted-accumulated straight into the resident
    accumulator -- the limb recombination IS the matmul epilogue.  The
    step's full A-matrix block (~7 MB) is streamed from HBM and
    double-buffered by the Pallas pipeline under the previous cell's MXU
    work; everything in the kernel body is static (column indices, output
    slices, shifts), so Mosaic emits straight-line MXU/VPU code.

    mu_ref: (1, 1) SMEM testvector amplitude.
    amt_ref: (Bt, n_pad) int32, column 0 = initial body rotation
      (2N - barb) mod 2N, column s+1 = step-s mask rotation.
    a_ref: (1, C, G, K, span) int8 this step's A-matrix block
      (ops/poly.prepare_amat).
    out_ref: (Bt, (k+1)*N) int32 resident accumulator (same block for all
      steps of a batch tile).
    d_ref: (Bt, U, G*K) int8 digit scratch, laid out so each coarse-shift u
      contributes ONE aligned (Bt, G*K) MXU operand with no in-kernel
      relayout.
    """
    p = params
    N, k1, l = p.N, p.k + 1, p.l
    G = k1 * l
    K = fine
    U = N // K
    s = pl.program_id(1)

    def amt_col(j):
        # Dynamic lane-dim slices are not Mosaic-legal (lane indices must be
        # 128-aligned); select the column with an iota mask + lane reduction
        # over the resident row block instead (cheap VPU pass).
        blk = amt_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
        return jnp.sum(jnp.where(lane == j, blk, 0), axis=1, keepdims=True)

    @pl.when(s == 0)
    def _():
        # acc init: zero mask polys, body = X^{-barb} * (all-mu testvector).
        bt = out_ref.shape[0]
        out_ref[:, : p.k * N] = jnp.zeros((bt, p.k * N), jnp.int32)
        tv = jnp.full((bt, N), mu_ref[0, 0], jnp.int32)
        out_ref[:, p.k * N:] = _rotate_block(tv, amt_col(0), N)

    # --- rotate + diff + decompose the current accumulator into d_ref ----
    amt = amt_col(s + 1)
    for u in range(k1):
        x = out_ref[:, u * N:(u + 1) * N]
        diff = _rotate_block(x, amt, N) - x
        for q, dq in enumerate(_decompose_block(diff, p)):
            g = u * l + q
            for w in range(U):
                d_ref[:, w, g * K:(g + 1) * K] = dq[:, w * K:(w + 1) * K]

    # --- C limb columns, U dots each, recombine into the accumulator.
    # All of one output poly's limb columns group into a single fused
    # shift-add expression so the accumulator is read-modified-written once
    # per output, not once per limb column.
    c = 0
    for o, nl in enumerate(plan):
        delta_o = None
        for m in range(nl):
            out_c = None
            for u in range(U):
                lhs = d_ref[:, u, :]                       # (Bt, G*K) int8
                off_u = (U - 1 - u) * K
                rhs = a_ref[0, c, :, :, off_u: off_u + N].reshape(G * K, N)
                acc = jax.lax.dot_general(
                    lhs, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out_c = acc if out_c is None else out_c + acc
            term = out_c << (8 * (4 - nl) + 8 * m)
            delta_o = term if delta_o is None else delta_o + term
            c += 1
        out_ref[:, o * N:(o + 1) * N] += delta_o


@functools.partial(jax.jit, static_argnames=("params", "block", "interpret"))
def fused_blind_rotate(amt: jax.Array, amat: jax.Array, mu,
                       params: TfheParams,
                       block: int | None = None,
                       interpret: bool = False) -> jax.Array:
    """Full blind rotation as ONE Pallas kernel against the precomputed
    A-matrix bootstrapping key (CloudKey.bk_amat, ops/poly.prepare_amat).

    amt: (B, n+1) int32 -- column 0 the initial body rotation
      (2N - barb) mod 2N, columns 1..n the per-step mask rotations bara.
    amat: (n, C, G, K, span) int8 fine-shift weights.
    mu: scalar torus32 testvector amplitude.
    Returns the final accumulator (B, (k+1)*N) int32.

    Grid (B/block, n), batch-tile outer: the accumulator block is VMEM-
    resident across all n steps of a tile; the only HBM traffic is the
    pipeline-double-buffered per-step A-matrix stream (~7 MB/step,
    overlapped under the MXU dots).  vs the unfused path this removes the
    per-step accumulator/digit HBM round-trips AND the (B, C*N) int32
    recombination materialization; vs in-kernel Toeplitz assembly (measured
    2.1x slower than unfused on v5e) the weight build is done once at
    keygen; vs a (tile, step, column) grid and vs hand-rolled per-column
    DMA (measured 0.9x / 0.7x of unfused) the per-cell work is C*U static
    dots with pipeline-managed streaming.  Needs ~2x 7 MB of VMEM for the
    A stream on top of the resident accumulator, so the kernel requests a
    raised vmem limit (v5e has 128 MB; Mosaic's default scoped limit is
    16 MB).
    """
    p = params
    plan = p.limb_plan
    B = amt.shape[0]
    n_steps, C, G, K, span = amat.shape
    N = p.N
    U = N // K
    assert span == N + (U - 1) * K, (span, N, K)
    assert C == sum(plan), (C, plan)
    # Env knob resolved at call time (PEBA1_FUSED_BLOCK); a block that does
    # not divide B degrades to the nearest dividing tile.
    if block is None:
        block = int(os.environ.get("PEBA1_FUSED_BLOCK", 128))
    bt = _fit_block(B, block)
    grid = (B // bt, n_steps)
    # amt rows padded so the lane dim satisfies int32 tiling.
    n_pad = -(-(n_steps + 1) // 128) * 128
    amt = jnp.pad(amt, ((0, 0), (0, n_pad - n_steps - 1)))
    kernel = functools.partial(_fused_cmux_kernel, params=p, plan=plan, fine=K)
    vmem_limit = int(os.environ.get("PEBA1_VMEM_LIMIT", 96 * 1024 * 1024))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bt, n_pad), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, G, K, span), lambda i, s: (s, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, (p.k + 1) * N), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, (p.k + 1) * N), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bt, U, G * K), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(jnp.array([[mu]], jnp.int32), amt, amat)


def _extprod_rec_kernel(d_ref, w_ref, out_ref, *, plan, N: int):
    """One batch tile of the external product with fused limb recombination.

    d_ref: (Bt, G*N) int8 gadget digits (rotate_decompose layout).
    w_ref: (G*N, C*N) int8 full negacyclic-Toeplitz weights for this CMUX
      step (CloudKey.bk_w[s]; columns output-major, low limb first, so output
      poly o's limbs occupy the contiguous segment [c0*N, (c0+nl)*N)).
    out_ref: (Bt, O*N) int32 recombined delta.

    The (Bt, C*N) int32 limb products exist only as per-output VMEM values:
    each output poly's GEMM segment is recombined (static shift-add over its
    nl limb blocks) immediately and written once.
    """
    lhs = d_ref[:]
    c0 = 0
    for o, nl in enumerate(plan):
        rhs = w_ref[:, c0 * N:(c0 + nl) * N]
        raw = jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)      # (Bt, nl*N)
        shift0 = 8 * (4 - nl)
        acc = None
        for m in range(nl):
            term = raw[:, m * N:(m + 1) * N] << (shift0 + 8 * m)
            acc = term if acc is None else acc + term
        out_ref[:, o * N:(o + 1) * N] = acc
        c0 += nl


@functools.partial(jax.jit, static_argnames=("params", "block", "interpret"))
def extprod_recombine(digits_flat: jax.Array, w_step: jax.Array,
                      params: TfheParams, block: int = 1024,
                      interpret: bool = False) -> jax.Array:
    """External product GEMM with the limb recombination fused as epilogue.

    digits_flat: (B, G*N) int8; w_step: (G*N, C*N) int8 (one step of
    CloudKey.bk_w).  Returns (B, (k+1)*N) int32 == extprod_toeplitz_i8
    bit-for-bit, but the (B, C*N) int32 limb-product intermediate never
    leaves VMEM: per-step HBM traffic drops from ~184 MB write + 184 MB read
    + 50 MB write (B=8192, t2 set) to the 50 MB delta write.

    Grid is batch tiles only; the weight block's index map is constant so the
    Pallas pipeline fetches it once and keeps it VMEM-resident across tiles.
    """
    p = params
    plan = p.limb_plan
    B, GN = digits_flat.shape
    CN = w_step.shape[1]
    assert w_step.shape[0] == GN, (w_step.shape, GN)
    assert CN == sum(plan) * p.N, (CN, plan, p.N)
    bt = _fit_block(B, block)
    vmem_limit = int(os.environ.get("PEBA1_VMEM_LIMIT", 100 * 1024 * 1024))
    return pl.pallas_call(
        functools.partial(_extprod_rec_kernel, plan=plan, N=p.N),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, GN), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GN, CN), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, (p.k + 1) * p.N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, (p.k + 1) * p.N), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(digits_flat, w_step)


def _cmux_step_kernel(amt_ref, w_ref, acc_in_ref, out_ref, d_ref,
                      *, params: TfheParams, plan):
    """One batch tile of a FULL CMUX step: rotate + diff + decompose the
    accumulator, external-product GEMM against this step's Toeplitz weights,
    limb recombination, and accumulate -- acc never leaves the kernel.

    out_ref is aliased to the acc input, so per step the only HBM traffic is
    one accumulator read + write, the weight stream, and the amt column.
    All digits are computed (into d_ref scratch) BEFORE any output write, so
    the aliased in-place update cannot clobber inputs of later reads.
    """
    p = params
    N, k1, l = p.N, p.k + 1, p.l
    amt = amt_ref[:]  # (Bt, 1)
    for u in range(k1):
        x = acc_in_ref[:, u * N:(u + 1) * N]
        diff = _rotate_block(x, amt, N) - x
        for q, dq in enumerate(_decompose_block(diff, p)):
            g = u * l + q
            d_ref[:, g * N:(g + 1) * N] = dq
    lhs = d_ref[:]
    c0 = 0
    for o, nl in enumerate(plan):
        rhs = w_ref[:, c0 * N:(c0 + nl) * N]
        raw = jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)      # (Bt, nl*N)
        shift0 = 8 * (4 - nl)
        delta = None
        for m in range(nl):
            term = raw[:, m * N:(m + 1) * N] << (shift0 + 8 * m)
            delta = term if delta is None else delta + term
        # All digits are in d_ref already, and slice o is never read again
        # after this write, so the aliased in-place update is safe.
        out_ref[:, o * N:(o + 1) * N] = acc_in_ref[:, o * N:(o + 1) * N] + delta
        c0 += nl


@functools.partial(jax.jit, static_argnames=("params", "block", "interpret"))
def cmux_step(acc_flat: jax.Array, amt: jax.Array, w_step: jax.Array,
              params: TfheParams,
              block: int | None = None,
              interpret: bool = False) -> jax.Array:
    """One whole blind-rotation step as a single Pallas kernel.

    acc_flat: (B, (k+1)*N) int32 accumulator (DONATED -- aliased to the
    output); amt: (B,) int32 step rotation in [0, 2N); w_step: (G*N, C*N)
    int8 (one step of CloudKey.bk_w).  Returns the updated accumulator,
    bit-identical to rotate_decompose + extprod_recombine + add but with the
    digit matrix and the recombined delta never leaving VMEM: ~117 MB/step
    of HBM traffic at B=8192 on the t2 set vs ~334 MB for the split path.
    """
    p = params
    plan = p.limb_plan
    B, accw = acc_flat.shape
    GN = (p.k + 1) * p.l * p.N
    assert accw == (p.k + 1) * p.N, (accw, p.k, p.N)
    assert w_step.shape == (GN, sum(plan) * p.N), (w_step.shape, GN, plan)
    # Env knob resolved at call time (PEBA1_STEP_BLOCK); a block that does
    # not divide B degrades to the nearest dividing tile.
    if block is None:
        block = int(os.environ.get("PEBA1_STEP_BLOCK", 1024))
    bt = _fit_block(B, block)
    vmem_limit = int(os.environ.get("PEBA1_VMEM_LIMIT", 100 * 1024 * 1024))
    return pl.pallas_call(
        functools.partial(_cmux_step_kernel, params=p, plan=plan),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w_step.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, accw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, accw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, accw), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bt, GN), jnp.int8)],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(amt.reshape(B, 1), w_step, acc_flat)


def _cmux_step_gen_kernel(amt_ref, vv_ref, acc_in_ref, out_ref, a_scr, d_scr,
                          *, params: TfheParams, plan, fine: int):
    """One batch tile of a full CMUX step with the step's Toeplitz weights
    assembled IN VMEM from the small doubled generator -- W never exists in
    HBM at all (vs `cmux_step`, which streams the precomputed bk_w, and the
    w_streaming scan branch, which materializes each step's W in HBM
    in-graph).  This is what makes the fused-step path viable at RING_2048,
    where one step's W is ~134 MB (exceeds VMEM) and bk_w would be ~137 GB.

    Assembly (once per step, at batch tile 0): for each of the G*C generator
    rows, ONE strided `pltpu.roll` builds all K fine-shift windows
    A[c, g*K + kappa, i] = vv[g, c, (base - kappa + i) mod 2N] as a
    (K, 2N) block (out[kappa, i] = vv[(i - shift - kappa) mod 2N] with
    shift = 2N - base), sliced to span = N + (U-1)*K lanes and written as one
    aligned (K, span) block -- no per-row scatter, no dynamic lane slices.
    The full Toeplitz row t = u*K + kappa is then
    W[(g, t), (c, j)] = A[c, g*K + kappa, j + (U-1-u)*K], exactly
    `ops/poly.prepare_amat`'s identity, so the dot stage is U aligned
    lane-slices of the scratch per limb column.

    amt_ref: (Bt, 1) int32 step rotation; vv_ref: (G, C, 2N) int8 doubled
    generator (one step of CloudKey.bk_tp); acc aliased in/out as in
    `cmux_step`; a_scr: (C, G*K, span) int8; d_scr: (U, Bt, G*K) int8 digits
    laid out so each coarse shift u is ONE contiguous (Bt, G*K) MXU operand.
    """
    p = params
    N, k1, l = p.N, p.k + 1, p.l
    G = k1 * l
    K = fine
    U = N // K
    span = N + (U - 1) * K
    base = N - (U - 1) * K
    C = sum(plan)

    @pl.when(pl.program_id(0) == 0)
    def _assemble():
        for g in range(G):
            for c in range(C):
                # Mosaic's (strided) rotate only handles 32-bit lanes; the
                # int8 generator row rides through int32 and truncates back.
                row = jnp.broadcast_to(vv_ref[g, c:c + 1, :], (K, 2 * N))
                win = pltpu.roll(row.astype(jnp.int32), 2 * N - base, axis=1,
                                 stride=1, stride_axis=0)
                a_scr[c, g * K:(g + 1) * K, :] = win[:, :span].astype(jnp.int8)

    # --- rotate + diff + decompose into the u-major digit scratch ---------
    amt = amt_ref[:]  # (Bt, 1)
    for up in range(k1):
        x = acc_in_ref[:, up * N:(up + 1) * N]
        diff = _rotate_block(x, amt, N) - x
        for q, dq in enumerate(_decompose_block(diff, p)):
            g = up * l + q
            for w in range(U):
                d_scr[w, :, g * K:(g + 1) * K] = dq[:, w * K:(w + 1) * K]

    # --- C limb columns, U dots each, recombined into the aliased acc.
    # All digits are in d_scr before any output write, so the in-place
    # update cannot clobber inputs of later reads (same contract as
    # _cmux_step_kernel).
    c = 0
    for o, nl in enumerate(plan):
        delta_o = None
        for m in range(nl):
            out_c = None
            for u in range(U):
                lhs = d_scr[u]                             # (Bt, G*K) int8
                off_u = (U - 1 - u) * K
                rhs = a_scr[c, :, off_u: off_u + N]        # (G*K, N) int8
                acc = jax.lax.dot_general(
                    lhs, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out_c = acc if out_c is None else out_c + acc
            term = out_c << (8 * (4 - nl) + 8 * m)
            delta_o = term if delta_o is None else delta_o + term
            c += 1
        out_ref[:, o * N:(o + 1) * N] = (
            acc_in_ref[:, o * N:(o + 1) * N] + delta_o)


@functools.partial(jax.jit, static_argnames=("params", "block", "interpret"))
def cmux_step_gen(acc_flat: jax.Array, amt: jax.Array, vv_step: jax.Array,
                  params: TfheParams,
                  block: int | None = None,
                  interpret: bool = False) -> jax.Array:
    """One whole blind-rotation step as a single Pallas kernel, weights
    assembled in VMEM from the doubled Toeplitz generator.

    acc_flat: (B, (k+1)*N) int32 accumulator (DONATED -- aliased to the
    output); amt: (B,) int32 step rotation in [0, 2N); vv_step: (G, C, 2N)
    int8 (one step of CloudKey.bk_tp).  Bit-identical to
    rotate + decompose + extprod_toeplitz_i8 + add, but per step the only
    HBM traffic is one accumulator read + write plus the ~G*C*2N-byte
    generator: no O(N^2)-per-step W in HBM (w_streaming) and no O(n*N^2)
    bk_w key (cmux_step).  The weight scratch (C, G*K, span) int8 stays
    VMEM-resident across the batch-tile grid, assembled once at tile 0.
    """
    p = params
    plan = p.limb_plan
    B, accw = acc_flat.shape
    G = (p.k + 1) * p.l
    C = sum(plan)
    K = min(p.amat_block, p.N)
    U = p.N // K
    span = p.N + (U - 1) * K
    assert accw == (p.k + 1) * p.N, (accw, p.k, p.N)
    assert vv_step.shape == (G, C, 2 * p.N), (vv_step.shape, G, C, p.N)
    # Env knob resolved at call time (PEBA1_STEP_BLOCK); a block that does
    # not divide B degrades to the nearest dividing tile.  Measured on v5e
    # (B=8192, scripts/diag.py throughput): t2_gen 24,148 bs/s at block 256
    # vs 15,199/18,651 at 512/1024 (small acc tiles pipeline under the MXU
    # dots); n2048_gen 1,359 at 1024 vs 1,282/1,322 at 256/512 (the N=2048
    # dots want the larger M dim).
    if block is None:
        block = int(os.environ.get(
            "PEBA1_STEP_BLOCK", 256 if p.N < 2048 else 1024))
    bt = _fit_block(B, block)
    # The N=2048/block-1024 shape needs ~113 MB scoped VMEM (128 MB on v5e).
    vmem_limit = int(os.environ.get("PEBA1_VMEM_LIMIT", 121_634_816))
    return pl.pallas_call(
        functools.partial(_cmux_step_gen_kernel, params=p, plan=plan, fine=K),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, C, 2 * p.N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, accw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, accw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, accw), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((C, G * K, span), jnp.int8),
            pltpu.VMEM((U, bt, G * K), jnp.int8),
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(amt.reshape(B, 1), vv_step, acc_flat)


def _gen_full_kernel(mu_ref, amt_ref, vv_ref, out_ref, a_scr, d_scr,
                     *, params: TfheParams, plan, fine: int, n_steps: int):
    """Whole blind rotation, one batch tile per grid cell: the accumulator
    lives in VMEM across ALL n CMUX steps, the complete doubled-generator
    key (vv_ref, n x G x C x 2N int8) is VMEM-resident (constant index map:
    fetched once, reused by every tile), and each step's Toeplitz weights are
    assembled into scratch by the same strided-roll trick as
    _cmux_step_gen_kernel.  vs the per-step kernel this removes the per-step
    accumulator HBM round-trip (~2 x (k+1)N x B x 4 bytes x n per batch) and
    n-1 of the n kernel launches; the step loop is a fori_loop (dynamic s),
    legal because every in-kernel slice offset except vv's leading step
    index is static.

    amt_ref: (Bt, n_pad) int32, column 0 = initial body rotation, column
    s+1 = step-s mask rotation (fused_blind_rotate's layout).
    """
    p = params
    N, k1, l = p.N, p.k + 1, p.l
    G = k1 * l
    K = fine
    U = N // K
    span = N + (U - 1) * K
    base = N - (U - 1) * K
    C = sum(plan)
    bt = out_ref.shape[0]

    def amt_col(j):
        # Dynamic lane-dim slices are not Mosaic-legal; select the column
        # with an iota mask + lane reduction (cheap VPU pass).
        blk = amt_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
        return jnp.sum(jnp.where(lane == j, blk, 0), axis=1, keepdims=True)

    # acc init: zero mask polys, body = X^{-barb} * (all-mu testvector).
    out_ref[:, : p.k * N] = jnp.zeros((bt, p.k * N), jnp.int32)
    tv = jnp.full((bt, N), mu_ref[0, 0], jnp.int32)
    out_ref[:, p.k * N:] = _rotate_block(tv, amt_col(0), N)

    def step(s, carry):
        # --- assemble this step's fine-shift windows from vv[s] ----------
        for g in range(G):
            for c in range(C):
                row = jnp.broadcast_to(vv_ref[s, g, c:c + 1, :], (K, 2 * N))
                win = pltpu.roll(row.astype(jnp.int32), 2 * N - base, axis=1,
                                 stride=1, stride_axis=0)
                a_scr[c, g * K:(g + 1) * K, :] = win[:, :span].astype(jnp.int8)
        # --- rotate + diff + decompose into the u-major digit scratch ----
        amt = amt_col(s + 1)
        for up in range(k1):
            x = out_ref[:, up * N:(up + 1) * N]
            diff = _rotate_block(x, amt, N) - x
            for q, dq in enumerate(_decompose_block(diff, p)):
                g = up * l + q
                for w in range(U):
                    d_scr[w, :, g * K:(g + 1) * K] = dq[:, w * K:(w + 1) * K]
        # --- dots + recombine + accumulate (all digits staged first) -----
        c = 0
        for o, nl in enumerate(plan):
            delta_o = None
            for m in range(nl):
                out_c = None
                for u in range(U):
                    lhs = d_scr[u]
                    off_u = (U - 1 - u) * K
                    rhs = a_scr[c, :, off_u: off_u + N]
                    acc = jax.lax.dot_general(
                        lhs, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    out_c = acc if out_c is None else out_c + acc
                term = out_c << (8 * (4 - nl) + 8 * m)
                delta_o = term if delta_o is None else delta_o + term
                c += 1
            out_ref[:, o * N:(o + 1) * N] += delta_o
        return carry

    jax.lax.fori_loop(0, n_steps, step, 0)


@functools.partial(jax.jit, static_argnames=("params", "block", "interpret"))
def blind_rotate_gen_full(amt: jax.Array, vv_all: jax.Array, mu,
                          params: TfheParams,
                          block: int | None = None,
                          interpret: bool = False) -> jax.Array:
    """Full blind rotation as ONE Pallas kernel with in-VMEM weight assembly
    and the whole generator key resident.

    amt: (B, n+1) int32 (column 0 = initial body rotation); vv_all: the
    complete CloudKey.bk_tp (n, G, C, 2N) int8 -- must fit in VMEM alongside
    the tile working set (t2 set: ~41 MB; k=1 fast set: ~36 MB; NOT viable
    at RING_2048's 134 MB, which stays on the per-step cmux_step_gen).
    Returns the final accumulator (B, (k+1)*N) int32, bit-identical to the
    scan-of-cmux_step_gen path.
    """
    p = params
    plan = p.limb_plan
    B = amt.shape[0]
    n_steps, G, C, n2 = vv_all.shape
    assert n2 == 2 * p.N and G == (p.k + 1) * p.l and C == sum(plan)
    K = min(p.amat_block, p.N)
    accw = (p.k + 1) * p.N
    if block is None:
        block = int(os.environ.get("PEBA1_FULL_BLOCK", 1024))
    bt = _fit_block(B, block)
    n_pad = -(-(n_steps + 1) // 128) * 128
    amt = jnp.pad(amt, ((0, 0), (0, n_pad - n_steps - 1)))
    U = p.N // K
    span = p.N + (U - 1) * K
    vmem_limit = int(os.environ.get("PEBA1_VMEM_LIMIT", 121_634_816))
    return pl.pallas_call(
        functools.partial(_gen_full_kernel, params=p, plan=plan, fine=K,
                          n_steps=n_steps),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bt, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_steps, G, C, 2 * p.N), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, accw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, accw), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((C, G * K, span), jnp.int8),
            pltpu.VMEM((U, bt, G * K), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(jnp.array([[mu]], jnp.int32), amt, vv_all)


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
    bt = _fit_block(B, block)
    grid = (B // bt,)
    # N=2048 shapes exceed Mosaic's default 16 MB scoped-vmem limit (the
    # (bt, G*N) digit block alone is 2 MB x pipeline stages); request the
    # same raised limit as the other kernels.
    vmem_limit = int(os.environ.get("PEBA1_VMEM_LIMIT", 121_634_816))
    return pl.pallas_call(
        functools.partial(_rot_dec_kernel, params=p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, (p.k + 1) * p.N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, G * p.N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G * p.N), jnp.int8),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(amt.reshape(B, 1), acc_flat)
