"""Phase-level TPU benchmark of the full bootstrap.

Environment lesson: every eager op dispatch and device->host pull crosses the
TPU tunnel (~100ms latency), so keygen runs as ONE jitted call, keys stay on
device, and only scalars come back.  A persistent compilation cache softens
the remote-compile latency across runs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from peba1_tpu import gates, keys, lwe
from peba1_tpu.ops import bootstrap as bs
from peba1_tpu.ops import decompose as dec
from peba1_tpu.ops import poly, rotate
from peba1_tpu.params import PEBA1_128

P = PEBA1_128


def timeit(f, *args, iters=3):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


t0 = time.time()
kg = jax.jit(keys.keygen, static_argnames=("params",))
sk, ck = kg(jax.random.PRNGKey(0), params=P)
jax.block_until_ready(ck.bk_conv)
print(f"jitted keygen: {time.time()-t0:.0f}s", flush=True)


def blind_rotate_scan(ck, bara, barb, mu, unroll=1):
    p = ck.params
    B = bara.shape[0]
    tv = jnp.full((B, p.N), jnp.int32(mu))
    acc = jnp.concatenate(
        [jnp.zeros((B, p.k, p.N), jnp.int32),
         rotate.negacyclic_rotate(tv, (2 * p.N - barb) % (2 * p.N))[:, None, :]],
        axis=1)

    def step(acc, xs):
        amt, bk_i = xs
        rot = rotate.negacyclic_rotate(acc, amt[:, None])
        diff = rot - acc
        d = dec.decompose(diff, p)
        d = jnp.moveaxis(d, -1, -2).reshape(B, (p.k + 1) * p.l, p.N)
        delta = poly.negacyclic_conv_i8(d, bk_i, p.bk_limbs)
        return acc + delta, ()

    acc, _ = jax.lax.scan(step, acc, (bara.T, ck.bk_conv), unroll=unroll)
    return acc


mu = jnp.int32(gates.MU_1_8)
for B in [256, 1024]:
    rng = np.random.default_rng(1)
    ct = lwe.Lwe(jnp.asarray(rng.integers(-2**31, 2**31, (B, P.n), dtype=np.int64).astype(np.int32)),
                 jnp.asarray(rng.integers(-2**31, 2**31, (B,), dtype=np.int64).astype(np.int32)))
    bara = rotate.modswitch_2n(ct.a, P.N)
    barb = rotate.modswitch_2n(ct.b, P.N)
    jax.block_until_ready(bara)

    t_scan1 = timeit(jax.jit(lambda a, b: blind_rotate_scan(ck, a, b, mu, 1)), bara, barb)
    print(f"B={B}: blind_rotate scan {t_scan1*1e3:.0f}ms -> {B/t_scan1:,.0f} bs/s", flush=True)
    t_scan4 = timeit(jax.jit(lambda a, b: blind_rotate_scan(ck, a, b, mu, 4)), bara, barb)
    print(f"B={B}: blind_rotate scan/unroll4 {t_scan4*1e3:.0f}ms -> {B/t_scan4:,.0f} bs/s", flush=True)

    acc = jax.jit(lambda a, b: blind_rotate_scan(ck, a, b, mu, 1))(bara, barb)
    from peba1_tpu import tlwe
    a_ext, b_ext = tlwe.sample_extract(acc)
    a_ext, b_ext = jax.block_until_ready((a_ext, b_ext))
    t_ks = timeit(jax.jit(lambda a, b: bs.keyswitch(ck, a, b)), a_ext, b_ext)
    print(f"      keyswitch {t_ks*1e3:.1f}ms", flush=True)
