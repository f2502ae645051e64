"""Bisect the toeplitz-backend step at B=4096: where does time go now?"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from peba1_tpu.ops import decompose as dec, poly, rotate, pallas_kernels as pk
from peba1_tpu.params import PEBA1_128

P = PEBA1_128
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N, G, O, L, n_steps = P.N, (P.k+1)*P.l, P.k+1, P.bk_limbs, P.n
rng = np.random.default_rng(0)
acc0 = jnp.asarray(rng.integers(-2**31, 2**31, (B, O, N), dtype=np.int64).astype(np.int32))
bara = jnp.asarray(rng.integers(0, 2*N, (n_steps, B)), jnp.int32)
bk_tp = jnp.asarray(rng.integers(-128, 128, (n_steps, G, O, L, 2*N), dtype=np.int64).astype(np.int8))
digits_fixed = jnp.asarray(rng.integers(-64, 64, (B, G, N), dtype=np.int64).astype(np.int8))

def timeit(f, *args, iters=3):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters): out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters

def loop(body, init=None):
    def f(x):
        def step(c, xs): return body(c, xs), ()
        c, _ = jax.lax.scan(step, x, (bara, bk_tp))
        return c
    return jax.jit(f)

# W build only
def wbuild(acc, xs):
    W = poly.negacyclic_toeplitz(xs[1])  # (G,O,L,N,N)
    W = jnp.moveaxis(W, -2, 1).reshape(G*N, O*L*N)
    return acc + W[0,0].astype(jnp.int32)
t = timeit(loop(wbuild), acc0); print(f"Wbuild-only:   {t/n_steps*1e3:.3f}ms/step", flush=True)

# dot only (prebuilt W per step impossible; build+dot)
def bdot(acc, xs):
    W = poly.negacyclic_toeplitz(xs[1])
    W = jnp.moveaxis(W, -2, 1).reshape(G*N, O*L*N)
    out = jnp.dot(digits_fixed.reshape(B, G*N), W, preferred_element_type=jnp.int32)
    out = out.reshape(B, O, L, N)
    return acc + poly.recombine_limbs_i32(jnp.moveaxis(out, 2, -1), L)
t = timeit(loop(bdot), acc0); print(f"build+dot+rec: {t/n_steps*1e3:.3f}ms/step", flush=True)

# pallas rotate+decompose only
def prd(acc, xs):
    d = pk.rotate_decompose(acc.reshape(B, -1), xs[0], P)
    return acc + d.reshape(B, G, N)[:, :O, :].astype(jnp.int32)
t = timeit(loop(prd), acc0); print(f"pallas rot+dec:{t/n_steps*1e3:.3f}ms/step", flush=True)

# full step with pallas front-end + toeplitz matmul
def full(acc, xs):
    d = pk.rotate_decompose(acc.reshape(B, -1), xs[0], P).reshape(B, G, N)
    return acc + poly.extprod_toeplitz_i8(d, xs[1], L)
t = timeit(loop(full), acc0)
print(f"FULL pallas+tp:{t/n_steps*1e3:.3f}ms/step -> {B/(t):,.0f} bs/s(rot-only)", flush=True)
