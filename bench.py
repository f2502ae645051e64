"""Headline benchmark: gate bootstraps/s/chip (BASELINE.json north star).

Runs a batched AND-gate bootstrap at the reference's lambda=128 parameters
(n=630, N=1024) on the default JAX backend (the TPU chip under the driver),
verifies decryption correctness of the batch, and prints ONE JSON line:

  {"metric": "gate_bootstraps_per_s_per_chip", "value": ..., "unit": ...,
   "vs_baseline": value / 10_000}

vs_baseline is measured against the BASELINE.md target of >=10^4
bootstraps/s/chip (the reference CPU binary manages ~10^2/s equivalent).
"""

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
from peba1_tpu.params import PEBA1_128

B = int(os.environ.get("PEBA1_BENCH_BATCH", "1024"))
ITERS = int(os.environ.get("PEBA1_BENCH_ITERS", "3"))


def main():
    params = PEBA1_128
    kg = jax.jit(keys.keygen, static_argnames=("params",))
    sk, ck = kg(jax.random.PRNGKey(0), params=params)
    jax.block_until_ready(ck.bk_conv)

    rng = np.random.default_rng(0)
    a_bits = jnp.asarray(rng.integers(0, 2, B))
    b_bits = jnp.asarray(rng.integers(0, 2, B))
    enc = jax.jit(gates.encrypt_bits)
    ca = enc(jax.random.PRNGKey(1), sk, a_bits)
    cb = enc(jax.random.PRNGKey(2), sk, b_bits)
    pre = lwe.Lwe(ca.a + cb.a, ca.b + cb.b + jnp.int32(-gates.MU_1_8))

    step = jax.jit(lambda ck, a, b: bs.bootstrap(ck, lwe.Lwe(a, b), jnp.int32(gates.MU_1_8)))
    out = step(ck, pre.a, pre.b)
    jax.block_until_ready(out.b)

    # correctness gate on the whole batch (one small host pull)
    got = np.asarray(gates.decrypt_bits(out, sk))
    want = np.asarray(a_bits & b_bits)
    correct = float((got == want).mean())

    t0 = time.time()
    for _ in range(ITERS):
        out = step(ck, pre.a, pre.b)
    jax.block_until_ready(out.b)
    dt = (time.time() - t0) / ITERS
    value = B / dt

    print(json.dumps({
        "metric": "gate_bootstraps_per_s_per_chip",
        "value": round(value, 1),
        "unit": "bootstraps/s",
        "vs_baseline": round(value / 10_000.0, 4),
        "batch": B,
        "ms_per_batch": round(dt * 1e3, 1),
        "batch_correct_frac": correct,
        "params": "peba1_128(n=630,N=1024)",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
