"""Raw matmul throughput, cache-proof (vary inputs), plus in-loop variant."""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)

def bench_loop(M, K, N, dtype, steps=20):
    """Chained matmuls inside one jit: no per-call overhead, no caching."""
    a = jnp.asarray(rng.integers(-64, 64, (M, K), dtype=np.int64).astype(np.int8))
    b = jnp.asarray(rng.integers(-128, 128, (K, N), dtype=np.int64).astype(np.int8))
    if dtype == "bf16":
        a = a.astype(jnp.bfloat16); b = b.astype(jnp.bfloat16)
        pet = jnp.float32
    else:
        pet = jnp.int32
    @functools.partial(jax.jit, static_argnames=("steps",))
    def f(a, b, steps):
        def body(c, _):
            o = jnp.dot(a + c.astype(a.dtype), b, preferred_element_type=pet)
            # fold output back so steps are serialized and inputs vary
            nc = (o[0, :K] if N >= K else jnp.pad(o[0], (0, K - N))).astype(jnp.int32) & 1
            return nc, ()
        c, _ = jax.lax.scan(body, jnp.zeros((K,), jnp.int32), None, length=steps)
        return c
    out = f(a, b, steps=2); jax.block_until_ready(out)
    t0 = time.time(); out = f(a, b, steps=steps); jax.block_until_ready(out)
    dt = (time.time() - t0) / steps
    print(f"{dtype} {M}x{K}x{N}: {dt*1e3:.2f}ms/mm -> {M*K*N/dt/1e12:.0f} T{'ops' if dtype=='i8' else 'flops'}", flush=True)

for shape in [(4096, 6144, 8192), (8192, 8192, 8192), (4096, 6144, 6144)]:
    bench_loop(*shape, "i8")
    bench_loop(*shape, "bf16")
