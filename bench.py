"""Headline benchmark: gate bootstraps/s/chip (BASELINE.json north star).

Runs CHAINED batched AND-gate bootstraps at the reference's lambda=128
parameters (n=630, N=1024) on the default JAX backend (the TPU chip), checks
decryption correctness of the chained output, and prints ONE JSON line:

  {"metric": "gate_bootstraps_per_s_per_chip", "value": ..., ...}

Chaining (each bootstrap's output feeds the next AND(x,x)=x) serializes the
steps, defeats any execution-result caching in the remote TPU relay, and
mirrors real circuit composition.  vs_baseline is against the BASELINE.md
target of >=10^4 bootstraps/s/chip.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get("PEBA1_CACHE", "/root/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from peba1_tpu import gates, keys, lwe
from peba1_tpu.ops import bootstrap as bs
from peba1_tpu.params import PRESETS

B = int(os.environ.get("PEBA1_BENCH_BATCH", "4096"))
CHAIN = int(os.environ.get("PEBA1_BENCH_CHAIN", "3"))
PARAMS = os.environ.get("PEBA1_BENCH_PARAMS", "peba1_128_fast")


@functools.partial(jax.jit, static_argnames=("steps",))
def _chain(ck, a, b, steps):
    """`steps` serialized identity bootstraps: AND(x, x) = x."""

    def body(c, _):
        pre = lwe.Lwe(c[0] * 2, c[1] * 2 + jnp.int32(-gates.MU_1_8))
        out = bs.bootstrap(ck, pre, jnp.int32(gates.MU_1_8))
        return (out.a, out.b), ()

    (a, b), _ = jax.lax.scan(body, (a, b), None, length=steps)
    return a, b


def main():
    params = PRESETS[PARAMS]
    kg = jax.jit(keys.keygen, static_argnames=("params",))
    sk, ck = kg(jax.random.PRNGKey(0), params=params)
    jax.block_until_ready(ck.ks_table_limbs)

    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, B))
    ct = gates.encrypt_bits(jax.random.PRNGKey(1), sk, bits)

    out = _chain(ck, ct.a, ct.b, steps=1)
    jax.block_until_ready(out)
    t0 = time.time()
    out = _chain(ck, ct.a, ct.b, steps=CHAIN)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / CHAIN
    value = B / dt

    got = np.asarray(lwe.decrypt_bit(lwe.Lwe(out[0], out[1]), sk.lwe_key))
    correct = float((got == np.asarray(bits)).mean())

    print(json.dumps({
        "metric": "gate_bootstraps_per_s_per_chip",
        "value": round(value, 1),
        "unit": "bootstraps/s",
        "vs_baseline": round(value / 10_000.0, 4),
        "batch": B,
        "chain": CHAIN,
        "ms_per_batch": round(dt * 1e3, 1),
        "batch_correct_frac": correct,
        "params": PARAMS,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
