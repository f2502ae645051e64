"""Benchmark the toeplitz-backend bootstrap on TPU at several batch sizes."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from peba1_tpu import gates, keys, lwe
from peba1_tpu.ops import bootstrap as bs
from peba1_tpu.params import PEBA1_128

P = PEBA1_128

def timeit(f, *args, iters=3):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters): out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters

t0 = time.time()
sk, ck = jax.jit(keys.keygen, static_argnames=("params",))(jax.random.PRNGKey(0), params=P)
jax.block_until_ready(ck.bk_tp)
print(f"keygen {time.time()-t0:.0f}s", flush=True)

step = jax.jit(lambda ck, a, b: bs.bootstrap(ck, lwe.Lwe(a, b), jnp.int32(gates.MU_1_8)))
rng = np.random.default_rng(0)
for B in [256, 1024, 4096]:
    a_bits = jnp.asarray(rng.integers(0, 2, B)); b_bits = jnp.asarray(rng.integers(0, 2, B))
    ca = gates.encrypt_bits(jax.random.PRNGKey(1), sk, a_bits)
    cb = gates.encrypt_bits(jax.random.PRNGKey(2), sk, b_bits)
    pa, pb = ca.a + cb.a, ca.b + cb.b + jnp.int32(-gates.MU_1_8)
    t = timeit(step, ck, pa, pb)
    out = step(ck, pa, pb)
    got = np.asarray(gates.decrypt_bits(out, sk))
    ok = (got == np.asarray(a_bits & b_bits)).mean()
    print(f"B={B}: {t*1e3:.0f}ms/batch -> {B/t:,.0f} bootstraps/s (correct {ok*100:.1f}%)", flush=True)
