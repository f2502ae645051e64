"""Compare toeplitz vs amat backends; chained timing defeats any result cache."""
import os, sys, time, dataclasses, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from peba1_tpu import gates, keys, lwe
from peba1_tpu.ops import bootstrap as bs
from peba1_tpu.params import PEBA1_128

def bench(P, name, batches=(1024, 4096), limbs=None):
    if limbs: P = dataclasses.replace(P, bk_limbs=limbs)
    t0 = time.time()
    sk, ck = jax.jit(keys.keygen, static_argnames=("params",))(jax.random.PRNGKey(0), params=P)
    jax.block_until_ready(ck.ks_table_limbs)
    print(f"[{name}] keygen {time.time()-t0:.0f}s", flush=True)

    @functools.partial(jax.jit, static_argnames=('steps',))
    def chain(ck, a, b, steps):
        def body(c, _):
            ct = lwe.Lwe(c[0], c[1])
            pre = lwe.Lwe(ct.a * 2, ct.b * 2 + jnp.int32(-gates.MU_1_8))  # AND(x,x)=x
            out = bs.bootstrap(ck, pre, jnp.int32(gates.MU_1_8))
            return (out.a, out.b), ()
        (a, b), _ = jax.lax.scan(body, (a, b), None, length=steps)
        return a, b

    rng = np.random.default_rng(0)
    for B in batches:
        bits = jnp.asarray(rng.integers(0, 2, B))
        ct = gates.encrypt_bits(jax.random.PRNGKey(1), sk, bits)
        out = chain(ck, ct.a, ct.b, steps=1); jax.block_until_ready(out)
        iters = 3
        t0 = time.time()
        out = chain(ck, ct.a, ct.b, steps=iters)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        got = np.asarray(lwe.decrypt_bit(lwe.Lwe(out[0], out[1]), sk.lwe_key))
        ok = (got == np.asarray(bits)).mean()
        print(f"[{name}] B={B}: {dt*1e3:.0f}ms/bootstrap-batch -> {B/dt:,.0f} bs/s (chain correct {ok*100:.1f}%)", flush=True)

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "tp"):
    bench(PEBA1_128, "toeplitz L4")
if which in ("all", "amat"):
    bench(dataclasses.replace(PEBA1_128, ext_backend="amat"), "amat L4")
if which in ("all", "amat3"):
    bench(dataclasses.replace(PEBA1_128, ext_backend="amat", bk_limbs=3), "amat L3")
