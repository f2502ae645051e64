"""Per-step cost breakdown of the blind rotation on the live chip.

Timing methodology for the axon relay (which caches execution results at
executable granularity -- a repeat call of the same executable returns
instantly, regardless of input values):
  * AOT-compile each variant via jit(fn).lower(...).compile() so the first
    execution carries no compile time;
  * run each SCAN-LENGTH variant exactly ONCE (cold), at two different
    lengths S1 < S2, and report (t(S2) - t(S1)) / (S2 - S1): constant
    dispatch/transfer overhead cancels.
  * calibrate with a plain int8 matmul scan of known MAC count.
"""
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from peba1_tpu.ops import pallas_kernels as pk
from peba1_tpu.ops import poly
from peba1_tpu.params import PEBA1_128

B = int(os.environ.get("B", "4096"))
S1, S2 = 16, 80


def measure(name, make_fn, args, macs_per_step=0):
    ts = {}
    for steps in (S1, S2):
        fn = jax.jit(functools.partial(make_fn, steps=steps))
        compiled = fn.lower(*args).compile()
        t0 = time.time()
        jax.block_until_ready(compiled(*args))
        ts[steps] = time.time() - t0
    dt = (ts[S2] - ts[S1]) / (S2 - S1)
    eff = f"  [{macs_per_step/dt/1e12:.0f} TMAC/s]" if macs_per_step else ""
    print(f"  {name}: {dt*1e3:.3f} ms/step (x630={dt*630*1e3:.0f} ms; "
          f"cold16={ts[S1]:.2f}s cold80={ts[S2]:.2f}s){eff}", flush=True)
    return dt


rng = np.random.default_rng(0)

# ---- calibration: plain int8 matmul (4096x6144)@(6144x8192) ----
lhs = jnp.asarray(rng.integers(-64, 64, (B, 6144)).astype(np.int8))
rhs = jnp.asarray(rng.integers(-64, 64, (6144, 8192)).astype(np.int8))


def calib(lhs, rhs, *, steps):
    def step(c, _):
        out = jnp.dot(c, rhs, preferred_element_type=jnp.int32)
        return (out[:, :6144] & 63).astype(jnp.int8), ()
    return jax.lax.scan(step, lhs, None, length=steps)


print(f"== calibration (B={B})", flush=True)
measure("int8 matmul 4096x6144x8192", calib, (lhs, rhs),
        macs_per_step=B * 6144 * 8192)

for l, bgbit in ((3, 7), (2, 8)):
    P = dataclasses.replace(PEBA1_128, l=l, bgbit=bgbit)
    G, O, L, N = (P.k + 1) * P.l, P.k + 1, P.bk_limbs, P.N
    print(f"== l={l} bgbit={bgbit}: G={G}, cols={O*L*N}", flush=True)
    acc = jnp.asarray(rng.integers(-2**31, 2**31, (B, O, N), dtype=np.int64).astype(np.int32))
    amt = jnp.asarray(rng.integers(0, 2 * N, (S2, B)).astype(np.int32))
    q = jnp.asarray(rng.integers(-2**31, 2**31, (S2, G, O, N), dtype=np.int64).astype(np.int32))
    vv = jax.vmap(lambda x: poly.prepare_toeplitz_rhs(x, L))(q)   # (S2, G, C, 2N)
    W_static = poly.negacyclic_toeplitz(vv[0])
    W_static = jnp.moveaxis(W_static, -2, 1).reshape(G * N, O * L * N)
    digits = jnp.asarray(rng.integers(-P.half_bg, P.half_bg, (B, G, N)).astype(np.int8))

    def rot_dec_only(acc, amts, *, steps):
        def step(c, a):
            d = pk.rotate_decompose(c.reshape(B, -1), a, P)
            c = c + d.reshape(B, G // O, O, N).astype(jnp.int32).sum(axis=1)
            return c, ()
        return jax.lax.scan(step, acc, amts[:steps])

    def matmul_only(d, W, *, steps):
        def step(c, _):
            out = jnp.dot(c, W, preferred_element_type=jnp.int32)
            r = poly.recombine_plan_i32(out.reshape(B, O * L, N), (L,) * O)
            c2 = jnp.tile(r & 63, (1, G // O, 1)).reshape(B, G * N).astype(jnp.int8)
            return c2, ()
        return jax.lax.scan(step, d.reshape(B, G * N), None, length=steps)

    def full_toeplitz(acc, amts, vv, *, steps):
        def step(c, xs):
            a, vv_i = xs
            d = pk.rotate_decompose(c.reshape(B, -1), a, P)
            d = d.reshape(B, G, N)
            delta = poly.extprod_toeplitz_i8(d, vv_i, L)
            return c + delta, ()
        out, _ = jax.lax.scan(step, acc, (amts[:steps], vv[:steps]))
        return out

    t_rot = measure("pallas rotate+dec ", rot_dec_only, (acc, amt))
    t_mm = measure("matmul+recombine  ", matmul_only, (digits, W_static),
                   macs_per_step=B * G * N * O * L * N)
    t_full = measure("FULL toeplitz step", full_toeplitz, (acc, amt, vv),
                     macs_per_step=B * G * N * O * L * N)
    print(f"  => W-assembly + unfused overhead: {(t_full-t_rot-t_mm)*1e3:.3f} ms/step",
          flush=True)
