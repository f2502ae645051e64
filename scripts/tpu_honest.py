"""Honesty probe for bench.py's timing on the axon relay.

Times the bench chain at two lengths (S1, S2) in two ways -- (a)
jax.block_until_ready only, (b) np.asarray host fetch -- on FRESH inputs for
each timed run.  If (a) scales with chain length like (b), block_until_ready
actually blocks on this relay and bench.py's number is honest; if (a) stays
flat, it's dispatch-only.  The (b) delta is the ground-truth throughput.
"""
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

from peba1_tpu import gates, keys, lwe
from peba1_tpu.ops import bootstrap as bs
from peba1_tpu.params import PRESETS

B = int(os.environ.get("B", "4096"))
PARAMS = os.environ.get("PARAMS", "peba1_128_fast")
S1, S2 = 1, 5


@functools.partial(jax.jit, static_argnames=("steps",))
def chain(ck, a, b, steps):
    def body(c, _):
        pre = lwe.Lwe(c[0] * 2, c[1] * 2 + jnp.int32(-gates.MU_1_8))
        out = bs.bootstrap(ck, pre, jnp.int32(gates.MU_1_8))
        return (out.a, out.b), ()
    (a, b), _ = jax.lax.scan(body, (a, b), None, length=steps)
    return a, b


def main():
    p = PRESETS[PARAMS]
    kg = jax.jit(keys.keygen, static_argnames=("params",))
    sk, ck = kg(jax.random.PRNGKey(0), params=p)
    np.asarray(ck.ks_table_limbs[0, :4])
    print("keys ready", flush=True)
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, B))
    seed = 50
    # warm both executables
    for s in (S1, S2):
        ct = gates.encrypt_bits(jax.random.PRNGKey(seed), sk, bits); seed += 1
        out = chain(ck, ct.a, ct.b, steps=s)
        np.asarray(out[1][:4])
        print(f"warm steps={s}", flush=True)

    res = {}
    for mode in ("block", "fetch"):
        ts = {}
        for s in (S1, S2):
            ct = gates.encrypt_bits(jax.random.PRNGKey(seed), sk, bits); seed += 1
            np.asarray(ct.b[:4])  # inputs resident
            t0 = time.time()
            out = chain(ck, ct.a, ct.b, steps=s)
            if mode == "block":
                jax.block_until_ready(out)
            else:
                np.asarray(out[1][:8])
            ts[s] = time.time() - t0
        dt = (ts[S2] - ts[S1]) / (S2 - S1)
        res[mode] = (ts[S1], ts[S2], dt)
        print(f"[{mode}] t{S1}={ts[S1]:.3f}s t{S2}={ts[S2]:.3f}s -> "
              f"{dt*1e3:.1f} ms/batch = {B/max(dt,1e-9):,.0f} bs/s", flush=True)


if __name__ == "__main__":
    main()
