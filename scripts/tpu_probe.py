"""First TPU probe: keygen + batched gate bootstrap at PEBA1_128 params.

Measures the headline metric (gate bootstraps/s/chip) for the conv-based
external product path and sanity-checks correctness of a batch of AND gates.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from peba1_tpu import gates, keys, lwe
from peba1_tpu.ops import bootstrap as bs
from peba1_tpu.params import PEBA1_128

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256

print("devices:", jax.devices())
t0 = time.time()
sk, ck = keys.keygen(jax.random.PRNGKey(0), PEBA1_128)
jax.block_until_ready(ck.bk_conv)
print(f"keygen: {time.time()-t0:.1f}s  bk_conv {ck.bk_conv.shape} {ck.bk_conv.dtype}")

# AND-gate batch: random bit pairs
rng = np.random.default_rng(0)
a_bits = jnp.asarray(rng.integers(0, 2, B))
b_bits = jnp.asarray(rng.integers(0, 2, B))
ca = gates.encrypt_bits(jax.random.PRNGKey(1), sk, a_bits)
cb = gates.encrypt_bits(jax.random.PRNGKey(2), sk, b_bits)
pre = lwe.Lwe(ca.a + cb.a, ca.b + cb.b + jnp.int32(-gates.MU_1_8))

f = jax.jit(lambda ck, ct: bs.bootstrap(ck, ct, jnp.int32(gates.MU_1_8)))
t0 = time.time()
out = f(ck, pre)
jax.block_until_ready(out.b)
print(f"first call (compile+run): {time.time()-t0:.1f}s")

# correctness
got = np.asarray(gates.decrypt_bits(out, sk))
want = np.asarray(a_bits & b_bits)
ok = (got == want).all()
print("AND batch correct:", ok, f"({(got == want).mean()*100:.1f}%)")

# throughput
iters = 3
t0 = time.time()
for _ in range(iters):
    out = f(ck, pre)
jax.block_until_ready(out.b)
dt = (time.time() - t0) / iters
print(f"batch={B}: {dt*1e3:.1f} ms/batch -> {B/dt:,.0f} bootstraps/s/chip")
