"""Negacyclic polynomial arithmetic in Z[X]/(X^N + 1) over torus32.

This module replaces the reference's external FFT processor (the
"nayuki-portable" double-precision FFT inside libtfhe, SURVEY.md E8) with two
TPU-native exact-integer paths:

1. ``negacyclic_mul_naive`` -- O(N^2) int32 schoolbook product with native
   mod-2^32 wrap-around.  Bit-exact by construction; used as the test oracle
   and inside keygen (cold path).

2. ``negacyclic_conv_i8`` -- the production path for external products: the
   small operand (gadget digits, |d| <= Bg/2 <= 128, int8) is convolved with
   the torus32 operand split into balanced signed 8-bit limbs, as one
   ``lax.conv_general_dilated`` in int8 with int32 accumulation.  XLA lowers
   this onto the MXU (int8 matmul units).  Exactness: each output coefficient
   accumulates at most G*N terms of |digit|*|limb| <= (k+1)*l*N*128*128 < 2^31,
   so the int32 accumulator never overflows; the limb recombination then wraps
   mod 2^32, which is exactly torus arithmetic.

Unlike the reference's per-gate scalar FFTs (one libtfhe call per gate,
/root/reference/src/Math.cpp:27-50), everything here is batched over a leading
ciphertext-batch dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def negacyclic_matrix(q: jax.Array) -> jax.Array:
    """Build the negacyclic (anti-circulant) matrix M with (p @ M) = p*q mod X^N+1.

    M[t, j] = q[(j - t) mod N] * (-1 if j < t else 1).
    """
    N = q.shape[-1]
    j = jnp.arange(N)[None, :]
    t = jnp.arange(N)[:, None]
    idx = (j - t) % N
    sign = jnp.where(j >= t, 1, -1).astype(q.dtype)
    return q[..., idx] * sign


def negacyclic_mul_naive(p: jax.Array, q: jax.Array) -> jax.Array:
    """Exact negacyclic product mod 2^32; p, q int32, broadcast leading dims."""
    p = jnp.asarray(p, jnp.int32)
    m = negacyclic_matrix(jnp.asarray(q, jnp.int32))
    # int32 matmul with wrap-around; einsum keeps this off the MXU (correct
    # but slow) -- this is the oracle/keygen path only.
    return jnp.einsum("...t,...tj->...j", p, m)


def round_to_limbs(x: jax.Array, limbs: int) -> jax.Array:
    """Round torus32 to the top `limbs` bytes (the canonical truncated value
    that split_limbs_i8(x, limbs) represents); identity when limbs == 4."""
    x = jnp.asarray(x, jnp.int32)
    if limbs >= 4:
        return x
    drop = 8 * (4 - limbs)
    return jnp.bitwise_and(x + (1 << (drop - 1)), np.int32(-1 << drop))


def split_limbs_i8(x: jax.Array, limbs: int = 4) -> jax.Array:
    """Split int32 into `limbs` balanced signed 8-bit limbs (axis appended last).

    x == sum_m out[..., m] * 2^(8m)  (mod 2^32, exact when limbs == 4; when
    limbs < 4 the value is rounded to the top `limbs` bytes, adding a
    symmetric error < 2^(8*(4-limbs)-1)).
    Each limb is in [-128, 127].
    """
    x = jnp.asarray(x, jnp.int32)
    if limbs < 4:
        drop = 8 * (4 - limbs)
        # Symmetric rounding to avoid bias: add half-ulp before truncation.
        x = x + (1 << (drop - 1))
        x = jnp.bitwise_and(x, np.int32(-1 << drop))
    out = []
    r = x >> (8 * (4 - limbs)) if limbs < 4 else x
    for _ in range(limbs):
        limb = ((r + 128) & 255) - 128  # balanced residue in [-128, 127]
        out.append(limb.astype(jnp.int8))
        r = (r - limb) >> 8  # arithmetic shift; exact since r - limb is mult of 256
    return jnp.stack(out, axis=-1)


def recombine_limbs_i32(conv: jax.Array, limbs: int) -> jax.Array:
    """Inverse of split_limbs_i8 over the last axis; wraps mod 2^32.

    conv: (..., limbs) int32 partial convolutions -> (...,) int32.
    When limbs < 4 the result is scaled back up by 2^(8*(4-limbs)).
    """
    shift0 = 8 * (4 - limbs)
    acc = jnp.zeros(conv.shape[:-1], jnp.int32)
    for m in range(limbs):
        acc = acc + (conv[..., m].astype(jnp.int32) << (shift0 + 8 * m))
    return acc


def as_limb_plan(limbs, n_out: int) -> "tuple[int, ...]":
    """Normalize an int or per-output tuple into a limb plan of length n_out."""
    if isinstance(limbs, int):
        return (limbs,) * n_out
    plan = tuple(limbs)
    assert len(plan) == n_out, (plan, n_out)
    return plan


def recombine_plan_i32(cols: jax.Array, plan: "tuple[int, ...]") -> jax.Array:
    """Recombine per-(output, limb) columns into O torus32 outputs.

    cols: (B, C, N) int32 with C = sum(plan), columns ordered output-major
    (output o's plan[o] limbs contiguous, low limb first) -> (B, O, N).
    """
    outs = []
    c0 = 0
    for nl in plan:
        shift0 = 8 * (4 - nl)
        acc = jnp.zeros(cols.shape[:1] + cols.shape[2:], jnp.int32)
        for m in range(nl):
            acc = acc + (cols[:, c0 + m] << (shift0 + 8 * m))
        outs.append(acc)
        c0 += nl
    return jnp.stack(outs, axis=1)


@functools.partial(jax.jit, static_argnames=("limbs",))
def negacyclic_conv_i8(digits: jax.Array, q_limbs_flipped: jax.Array, limbs) -> jax.Array:
    """Batched exact negacyclic product via int8 convolution on the MXU.

    Args:
      digits: (B, G, N) int8 -- G gadget-digit polynomials per batch element.
      q_limbs_flipped: (C, G, N) int8 -- one channel per (output poly, limb)
        column (C = sum(plan)), REVERSED along N (from `prepare_conv_rhs`).
        The conv sums over G.
      limbs: int (uniform) or per-output limb plan.

    Returns:
      (B, O, N) int32: sum_g digits[:, g] * q[g, o] mod X^N+1, mod 2^32.
    """
    B, G, N = digits.shape
    C = q_limbs_flipped.shape[0]
    # Linear convolution: pad input by N-1 both sides; rhs already flipped.
    lin = jax.lax.conv_general_dilated(
        digits,
        q_limbs_flipped,
        window_strides=(1,),
        padding=[(N - 1, N - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.int32,
    )  # (B, C, 2N-1)
    # Negacyclic fold: c[j] = lin[j] - lin[j+N], j in [0, N).
    c = lin[..., :N] - jnp.pad(lin[..., N:], ((0, 0), (0, 0), (0, 1)))
    plan = limbs if isinstance(limbs, tuple) else as_limb_plan(limbs, _n_out(C, limbs))
    return recombine_plan_i32(c, plan)


def _n_out(C: int, limbs) -> int:
    assert isinstance(limbs, int) and C % limbs == 0
    return C // limbs


def prepare_conv_rhs(q: jax.Array, limbs) -> jax.Array:
    """Precompute the conv RHS for `negacyclic_conv_i8` from torus32 polys.

    Args:
      q: (G, O, N) int32 torus polynomials (G contraction rows, O outputs).
      limbs: int (uniform) or per-output limb plan.

    Returns:
      (C, G, N) int8, limb-split and reversed along N; C = sum(plan), columns
      output-major, low limb first.
    """
    G, O, N = q.shape
    plan = as_limb_plan(limbs, O)
    chans = []
    for o, nl in enumerate(plan):
        ql = split_limbs_i8(q[:, o], nl)       # (G, N, nl)
        chans.append(jnp.moveaxis(ql, -1, 0))  # (nl, G, N)
    out = jnp.concatenate(chans, axis=0)       # (C, G, N)
    return out[..., ::-1]                      # flip N for correlation->conv


def doubled_neg(q: jax.Array) -> jax.Array:
    """vv = concat(-q, q) along the last axis: the generator vector from which
    every negacyclic-Toeplitz row is a contiguous window (row t = vv[N-t:2N-t])."""
    return jnp.concatenate([-q, q], axis=-1)


def negacyclic_toeplitz(vv: jax.Array, block: int | None = None) -> jax.Array:
    """Materialize the negacyclic matrix W[.., t, j] = vv[.., N - t + j] from
    the doubled generator, using ONLY static slices/stacks (TPU-friendly: no
    gather, no conv).  vv: (..., 2N) -> (..., N, N) with W[t] = X^t * q rows.

    Two-stage skew: fine shifts t0 in [0, block) then coarse block shifts --
    136 static slices total, intermediates ~(block, N + (U-1)*block).
    """
    N = vv.shape[-1] // 2
    if block is None:
        block = min(128, N)
    assert N % block == 0
    U = N // block
    span = N + (U - 1) * block  # window covering all coarse offsets per t0
    # A[.., t0, i] = vv[.., (block - t0) + i], i in [0, span)
    A = jnp.stack([
        jax.lax.slice_in_dim(vv, block - t0, block - t0 + span, axis=-1)
        for t0 in range(block)
    ], axis=-2)  # (..., block, span)
    # W[.., t1*block + t0, j] = vv[.., N - t0 - block*t1 + j]
    #                        = A[.., t0, (N - block) - block*t1 + j]
    blocks = [
        jax.lax.slice_in_dim(A, (N - block) - block * t1, (N - block) - block * t1 + N, axis=-1)
        for t1 in range(U)
    ]
    W = jnp.stack(blocks, axis=-3)  # (..., U, block, N)
    return W.reshape(vv.shape[:-1] + (N, N))


def extprod_toeplitz_i8(digits: jax.Array, vv_limbs: jax.Array, limbs) -> jax.Array:
    """External product via explicit negacyclic-Toeplitz int8 matmul.

    digits: (B, G, N) int8; vv_limbs: (G, C, 2N) int8 (doubled limb-split
    TRGSW row polys, from `prepare_toeplitz_rhs`; C = sum(limb plan)).
    Returns (B, O, N) int32 mod 2^32.  Functionally identical to
    `negacyclic_conv_i8` but lowers to one dense MXU matmul per call --
    XLA's conv lowering for kernel-size-N 1D convs is ~50x slower in-loop.
    """
    B, G, N = digits.shape
    C = vv_limbs.shape[1]
    plan = limbs if isinstance(limbs, tuple) else as_limb_plan(limbs, C // limbs)
    W = negacyclic_toeplitz(vv_limbs)              # (G, C, N_t, N_j)
    W = jnp.moveaxis(W, -2, 1)                     # (G, N_t, C, N_j)
    W = W.reshape(G * N, C * N)
    out = jnp.dot(digits.reshape(B, G * N), W, preferred_element_type=jnp.int32)
    return recombine_plan_i32(out.reshape(B, C, N), plan)


def prepare_toeplitz_rhs(q: jax.Array, limbs) -> jax.Array:
    """Precompute the doubled limb-split generator for `extprod_toeplitz_i8`.

    q: (G, O, N) int32 -> (G, C, 2N) int8; C = sum(limb plan), columns
    output-major, low limb first.

    NB: the negated half is limb-split from -q (int32) rather than negating
    the limbs of q: balanced limbs hit -128, whose int8 negation overflows.
    Recombination is linear, so mixing limbs-of(-q) in the wrap region with
    limbs-of(q) elsewhere reconstructs the exact signed Toeplitz.
    """
    G, O, N = q.shape
    plan = as_limb_plan(limbs, O)
    cols = []
    for o, nl in enumerate(plan):
        # Round ONCE to the canonical nl-byte value, then split +-q_r (both
        # exactly representable).  Splitting -q and q independently would
        # round ties (low byte 0x80) in opposite directions, making the two
        # Toeplitz halves encode different polynomials.
        q_r = round_to_limbs(q[:, o], nl)
        neg = split_limbs_i8(-q_r, nl)                 # (G, N, nl)
        pos = split_limbs_i8(q_r, nl)
        vv = jnp.concatenate([neg, pos], axis=-2)      # (G, 2N, nl)
        cols.append(jnp.moveaxis(vv, -1, 1))           # (G, nl, 2N)
    return jnp.concatenate(cols, axis=1)               # (G, C, 2N)


def negacyclic_toeplitz_cols(vv: jax.Array, j0: jax.Array, nj: int,
                             block: int | None = None) -> jax.Array:
    """Column slice W[.., t, j0:j0+nj] of the negacyclic Toeplitz matrix,
    with a TRACED start column j0 (static width nj).

    This is the ring-dimension tensor-parallel building block: each tp rank
    assembles only its [j0, j0+nj) slice of every per-step weight matrix from
    the small doubled generator (CloudKey.bk_tp stays replicated), so W is
    never materialized full-width on any one device -- the "polynomial limbs
    partitioned over the mesh" axis of SURVEY.md section 2.4 (the FFT layer
    being replaced: /root/reference/CMakeLists.txt:11).

    Same two-stage skew as `negacyclic_toeplitz` (fine shifts then coarse
    block shifts), but the fine stage uses dynamic_slice with start j0
    (XLA-legal for traced starts; this path is not used inside Pallas
    kernels).  vv: (..., 2N) -> (..., N, nj).  Requires 0 <= j0 <= N - nj.
    """
    N = vv.shape[-1] // 2
    if block is None:
        block = min(128, N)
    assert N % block == 0 and N % nj == 0, (N, block, nj)
    U = N // block
    width = (N - block) + nj
    j0 = jnp.asarray(j0, jnp.int32)
    # A[.., t0, i] = vv[.., (block - t0) + j0 + i], i in [0, width)
    A = jnp.stack([
        jax.lax.dynamic_slice_in_dim(vv, block - t0 + j0, width, axis=-1)
        for t0 in range(block)
    ], axis=-2)  # (..., block, width)
    # W[.., t1*block + t0, dj] = vv[.., N - t0 - block*t1 + j0 + dj]
    #                          = A[.., t0, (N - block) - block*t1 + dj]
    blocks = [
        jax.lax.slice_in_dim(A, (N - block) - block * t1,
                             (N - block) - block * t1 + nj, axis=-1)
        for t1 in range(U)
    ]
    W = jnp.stack(blocks, axis=-3)  # (..., U, block, nj)
    return W.reshape(vv.shape[:-1] + (N, nj))


def extprod_toeplitz_cols_i8(digits: jax.Array, vv_limbs: jax.Array, limbs,
                             j0: jax.Array, nj: int) -> jax.Array:
    """Column slice [j0, j0+nj) of the external product `extprod_toeplitz_i8`.

    digits: (B, G, N) int8; vv_limbs: (G, C, 2N) int8; j0 traced, nj static.
    Returns (B, O, nj) int32 == extprod_toeplitz_i8(...)[..., j0:j0+nj]
    bit-for-bit: the output coefficient axis is embarrassingly column-
    parallel (each j is an independent dot against the digit rows), so a tp
    rank computing only its slice and all_gathering matches the replicated
    product exactly.
    """
    B, G, N = digits.shape
    C = vv_limbs.shape[1]
    plan = limbs if isinstance(limbs, tuple) else as_limb_plan(limbs, C // limbs)
    W = negacyclic_toeplitz_cols(vv_limbs, j0, nj)  # (G, C, N_t, nj)
    W = jnp.moveaxis(W, -2, 1)                      # (G, N_t, C, nj)
    W = W.reshape(G * N, C * nj)
    out = jnp.dot(digits.reshape(B, G * N), W, preferred_element_type=jnp.int32)
    return recombine_plan_i32(out.reshape(B, C, nj), plan)


def prepare_w_full(vv_limbs: jax.Array, chunk: int | None = None) -> jax.Array:
    """Materialize the full per-step Toeplitz weight matrices at keygen.

    vv_limbs: (n, G, C, 2N) int8 doubled limb generator (prepare_toeplitz_rhs,
    vmapped over steps) -> (n, G*N, C*N) int8 with
    W[s, g*N + t, c*N + j] = (X^t * q_limb[s, g, c])[j] -- exactly the matrix
    `extprod_toeplitz_i8` assembles per step, precomputed once so the
    per-step GEMM (pallas_kernels.extprod_recombine) streams it directly.

    Built in step chunks through a fori_loop + dynamic_update_slice so the
    intermediate Toeplitz stacks stay ~1 GB while the (large: ~10.9 GB on the
    t2 set) output buffer is updated in place.
    """
    n, G, C, n2 = vv_limbs.shape
    N = n2 // 2
    if chunk is None:
        # Largest divisor of n that is <= 64 steps AND keeps the per-chunk
        # Toeplitz intermediate (chunk * G * C * N * N int8) within ~1 GB.
        per_step = G * C * N * N
        cap = min(64, n, max(1, 2**30 // max(1, per_step)))
        chunk = next((c for c in range(cap, 0, -1) if n % c == 0), 1)
    assert n % chunk == 0, (n, chunk)
    out = jnp.zeros((n, G * N, C * N), jnp.int8)

    def body(i, out):
        vv = jax.lax.dynamic_slice_in_dim(vv_limbs, i * chunk, chunk, 0)
        w = negacyclic_toeplitz(vv)               # (chunk, G, C, N, N)
        w = jnp.moveaxis(w, 3, 2)                 # (chunk, G, N_t, C, N_j)
        w = w.reshape(chunk, G * N, C * N)
        return jax.lax.dynamic_update_slice_in_dim(out, w, i * chunk, 0)

    return jax.lax.fori_loop(0, n // chunk, body, out)


def prepare_amat(vv_limbs: jax.Array, block: int = 128) -> jax.Array:
    """Precompute the fine-shift stage of the Toeplitz build ("A-matrix").

    vv_limbs: (..., G, C, 2N) doubled limb generator (prepare_toeplitz_rhs)
    -> (..., C, G, K, span) int8 with A[c, g, kappa, j] = vv[g, c,
    (N-(U-1)K) - kappa + j], span = N + (U-1)K, K = min(block, N), U = N//K.

    With this laid out at keygen, the per-step full Toeplitz W assembles from
    U contiguous slices with NO transpose:
      W[(g, u*K+kappa), (c, j)] = A[c, g, kappa, j + (U-1-u)*K].
    The limb-column axis C leads (ahead of the tiled K/span dims) so the
    fused Pallas kernel can grid over it: TPU block shapes may only block
    the last two dims in (8, 128)-divisible chunks.
    """
    n2 = vv_limbs.shape[-1]
    N = n2 // 2
    K = min(block, N)
    U = N // K
    span = N + (U - 1) * K
    base = N - (U - 1) * K
    sl = [
        jax.lax.slice_in_dim(vv_limbs, base - kappa, base - kappa + span, axis=-1)
        for kappa in range(K)
    ]
    A = jnp.stack(sl, axis=-3)        # (..., G, K, C, span)
    return jnp.moveaxis(A, -2, -4)    # (..., C, G, K, span)


def extprod_amat_i8(digits: jax.Array, A_i: jax.Array, limbs, N: int) -> jax.Array:
    """External product via the precomputed A-matrix: slice-assemble W, one dot.

    digits: (B, G, N) int8; A_i: (C, G, K, span) int8 for this step.
    Returns (B, O, N) int32 mod 2^32.  Identical math to extprod_toeplitz_i8
    but the per-step data movement is U contiguous slice-copies plus one
    transpose (the W materialization) -- no fine-stage rebuild.
    """
    B, G, _ = digits.shape
    C, _, K, _ = A_i.shape
    plan = limbs if isinstance(limbs, tuple) else as_limb_plan(limbs, C // limbs)
    U = N // K
    w_slices = [
        jax.lax.slice_in_dim(A_i, (U - 1 - u) * K, (U - 1 - u) * K + N, axis=-1)
        for u in range(U)
    ]
    W = jnp.stack(w_slices, axis=2)            # (C, G, U, K, N)
    W = jnp.moveaxis(W, 0, 3)                  # (G, U, K, C, N)
    W = W.reshape(G * N, C * N)
    out = jnp.dot(digits.reshape(B, G * N), W, preferred_element_type=jnp.int32)
    return recombine_plan_i32(out.reshape(B, C, N), plan)


def key_negacyclic_mul(key_bits: jax.Array, a: jax.Array) -> jax.Array:
    """sum_u key_u * a_u mod X^N+1, exact, via the int8 conv path.

    key_bits: (k, N) 0/1; a: (..., k, N) torus32.  Returns (..., N) int32.
    Used on the keygen/encryption side (TRLWE bodies) where the torus32
    operand varies per sample and the binary key is fixed: the torus operand
    limb-splits into the int8 "digit" role, the key is the conv filter.
    Accumulation bound: k*N*128*1 < 2^31.
    """
    k, N = key_bits.shape
    batch = a.shape[:-2]
    al = split_limbs_i8(a, 4)                      # (..., k, N, 4)
    al = jnp.moveaxis(al, -1, -3)                  # (..., 4, k, N)
    lhs = al.reshape((-1, k, N))                   # (B*4, k, N)
    rhs = jnp.asarray(key_bits, jnp.int8)[None, :, ::-1]  # (1, k, N) flipped
    lin = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(N - 1, N - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.int32,
    )[:, 0, :]                                     # (B*4, 2N-1)
    c = lin[:, :N] - jnp.pad(lin[:, N:], ((0, 0), (0, 1)))
    c = c.reshape(batch + (4, N))
    return recombine_limbs_i32(jnp.moveaxis(c, -2, -1), 4)


def dot_key_i32(a: jax.Array, key_bits: jax.Array) -> jax.Array:
    """Exact <a, key> mod 2^32 for binary key: (..., n) int32 x (n,) -> (...,).

    Limb-splits `a` to int8 so the contraction runs as an int8 matmul
    (MXU-friendly); bound n*128 < 2^31.
    """
    n = key_bits.shape[-1]
    al = split_limbs_i8(a, 4)                      # (..., n, 4)
    al = jnp.moveaxis(al, -1, -2)                  # (..., 4, n)
    out = jnp.einsum("...ln,n->...l", al, jnp.asarray(key_bits, jnp.int8),
                     preferred_element_type=jnp.int32)
    return recombine_limbs_i32(out, 4)


def negacyclic_extproduct_reference(digits: jax.Array, q: jax.Array) -> jax.Array:
    """Oracle: (B, G, N) int32 digits x (G, O, N) int32 -> (B, O, N) int32."""
    m = negacyclic_matrix(q)  # (G, O, N, N)
    return jnp.einsum("bgt,gotj->boj", jnp.asarray(digits, jnp.int32), m)
