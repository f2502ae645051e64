"""Microbenchmark the blind-rotation step components on TPU.

Breaks one CMUX step into: barrel rotate, gadget decompose, int8 conv,
recombine -- and times each at several batch sizes, plus an alternative
external-product formulation (explicit Toeplitz matmul) for comparison.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from peba1_tpu.ops import decompose as dec
from peba1_tpu.ops import poly, rotate
from peba1_tpu.params import PEBA1_128

P = PEBA1_128
N, G, O, L = P.N, (P.k + 1) * P.l, P.k + 1, P.bk_limbs
rng = np.random.default_rng(0)


def timeit(f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


for B in [64, 256, 1024]:
    acc = jnp.asarray(rng.integers(-2**31, 2**31, (B, O, N), dtype=np.int64).astype(np.int32))
    amt = jnp.asarray(rng.integers(0, 2 * N, (B, 1)), jnp.int32)
    digits = jnp.asarray(rng.integers(-64, 64, (B, G, N), dtype=np.int64).astype(np.int8))
    bk_step = jnp.asarray(rng.integers(-2**31, 2**31, (G, O, N), dtype=np.int64).astype(np.int32))
    rhs = poly.prepare_conv_rhs(bk_step, L)

    t_rot = timeit(jax.jit(rotate.negacyclic_rotate), acc, amt)
    t_dec = timeit(jax.jit(lambda x: dec.decompose(x, P)), acc)
    t_conv = timeit(jax.jit(lambda d, r: poly.negacyclic_conv_i8(d, r, L)), digits, rhs)

    # alternative: explicit negacyclic Toeplitz matmul (int8), built in-graph
    def ext_toeplitz(d, bk):
        # bk: (G, O, N) int32 -> limbs (G, O, N, L) -> toeplitz (G*N, O*N*L) i8
        bl = poly.split_limbs_i8(bk, L)                # (G, O, N, L)
        m = poly.negacyclic_matrix(jnp.moveaxis(bl, -1, 1))  # (G, L?, ...) careful
        return m

    def ext_mm(d, bk_limbs_toep):
        B_ = d.shape[0]
        out = jnp.dot(d.reshape(B_, G * N), bk_limbs_toep,
                      preferred_element_type=jnp.int32)
        return out

    # precomputed toeplitz variant (storage (G*N, O*L*N) int8 per step)
    bl = poly.split_limbs_i8(bk_step, L)               # (G, O, N, L)
    toep = poly.negacyclic_matrix(bl.transpose(0, 1, 3, 2))  # (G,O,L,N,N)
    toep = toep.transpose(0, 3, 1, 2, 4).reshape(G * N, O * L * N).astype(jnp.int8)
    t_mm = timeit(jax.jit(ext_mm), digits, toep)

    total_est = (t_rot + t_dec + t_conv) * P.n
    print(f"B={B}: rotate {t_rot*1e3:.2f}ms decomp {t_dec*1e3:.2f}ms "
          f"conv {t_conv*1e3:.2f}ms toeplitz_mm {t_mm*1e3:.2f}ms | "
          f"est full rotate {total_est*1e3:.0f}ms -> {B/ (total_est):,.0f} bs/s (conv path)")
    alt = (t_rot + t_dec + t_mm) * P.n
    print(f"      est with toeplitz-mm: {alt*1e3:.0f}ms -> {B/alt:,.0f} bs/s")
