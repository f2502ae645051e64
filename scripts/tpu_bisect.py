"""Bisect the blind-rotation scan body: which component is slow IN THE LOOP?"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from peba1_tpu.ops import decompose as dec
from peba1_tpu.ops import poly, rotate
from peba1_tpu.params import PEBA1_128

P = PEBA1_128
B = 256
N, G, O, L = P.N, (P.k + 1) * P.l, P.k + 1, P.bk_limbs
n_steps = P.n

rng = np.random.default_rng(0)
acc0 = jnp.asarray(rng.integers(-2**31, 2**31, (B, O, N), dtype=np.int64).astype(np.int32))
bara = jnp.asarray(rng.integers(0, 2 * N, (n_steps, B)), jnp.int32)
bk_conv = jnp.asarray(rng.integers(-128, 128, (n_steps, O * L, G, N), dtype=np.int64).astype(np.int8))
digits_fixed = jnp.asarray(rng.integers(-64, 64, (B, G, N), dtype=np.int64).astype(np.int8))


def timeit(f, *args, iters=3):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def loop(body):
    def f(acc):
        def step(acc, xs):
            return body(acc, xs), ()
        acc, _ = jax.lax.scan(step, acc, (bara, bk_conv))
        return acc
    return jax.jit(f)


# 1: conv only (fixed digits, per-step bk)
t = timeit(loop(lambda acc, xs: acc + poly.negacyclic_conv_i8(digits_fixed, xs[1], L)), acc0)
print(f"conv-only loop:        {t*1e3:.0f}ms ({t/n_steps*1e3:.3f}ms/step)", flush=True)

# 2: rotate only
t = timeit(loop(lambda acc, xs: rotate.negacyclic_rotate(acc, xs[0][:, None]) - acc), acc0)
print(f"rotate-only loop:      {t*1e3:.0f}ms ({t/n_steps*1e3:.3f}ms/step)", flush=True)

# 3: decompose+reshape only
def dbody(acc, xs):
    d = dec.decompose(acc, P)
    d = jnp.moveaxis(d, -1, -2).reshape(B, G, N)
    return acc + d[:, :O, :].astype(jnp.int32)
t = timeit(loop(dbody), acc0)
print(f"decomp-only loop:      {t*1e3:.0f}ms ({t/n_steps*1e3:.3f}ms/step)", flush=True)

# 4: decompose + conv (no rotate)
def dcbody(acc, xs):
    d = dec.decompose(acc, P)
    d = jnp.moveaxis(d, -1, -2).reshape(B, G, N)
    return acc + poly.negacyclic_conv_i8(d, xs[1], L)
t = timeit(loop(dcbody), acc0)
print(f"decomp+conv loop:      {t*1e3:.0f}ms ({t/n_steps*1e3:.3f}ms/step)", flush=True)

# 5: full body
def full(acc, xs):
    rot = rotate.negacyclic_rotate(acc, xs[0][:, None])
    d = dec.decompose(rot - acc, P)
    d = jnp.moveaxis(d, -1, -2).reshape(B, G, N)
    return acc + poly.negacyclic_conv_i8(d, xs[1], L)
t = timeit(loop(full), acc0)
print(f"full loop:             {t*1e3:.0f}ms ({t/n_steps*1e3:.3f}ms/step)", flush=True)
