"""Honest full-bootstrap throughput on the axon relay.

Relay pitfalls this works around (see scripts/tpu_profile_step.py docstring
history): block_until_ready does NOT block -- only host fetches do (with
0.1-0.9 s latency noise); repeat executions of the same executable+inputs
return cached results.  So:
  * time = dispatch -> np.asarray(small output) fetched;
  * two chain lengths S1 < S2, report (t(S2)-t(S1))/(S2-S1): fetch noise and
    constant overhead cancel;
  * every timed execution uses fresh inputs (new encryption key).

Usage: python scripts/tpu_bench5.py [config ...]; default runs all.
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

from peba1_tpu import gates, keys, lwe
from peba1_tpu.ops import bootstrap as bs
from peba1_tpu.params import PEBA1_128

B = int(os.environ.get("B", "8192"))
S1, S2 = 1, 4

CONFIGS = {
    "l3_exact": PEBA1_128,
    "l3_exact_pallas": dataclasses.replace(PEBA1_128, use_pallas_rotate=True),
    "l3_body3": dataclasses.replace(PEBA1_128, bk_body_limbs=3, use_pallas_rotate=True),
    "l2_exact": dataclasses.replace(PEBA1_128, l=2, bgbit=8, use_pallas_rotate=True),
    "l2_body3": dataclasses.replace(
        PEBA1_128, l=2, bgbit=8, bk_body_limbs=3, use_pallas_rotate=True),
    "l2_body3_amat": dataclasses.replace(
        PEBA1_128, l=2, bgbit=8, bk_body_limbs=3, use_pallas_rotate=True,
        ext_backend="amat"),
    "l2_body3_fused": dataclasses.replace(
        PEBA1_128, l=2, bgbit=8, bk_body_limbs=3, use_fused_cmux=True),
    "l3_fused": dataclasses.replace(PEBA1_128, use_fused_cmux=True),
}


def chain(ck, a, b, *, steps):
    def body(c, _):
        pre = lwe.Lwe(c[0] * 2, c[1] * 2 + jnp.int32(-gates.MU_1_8))
        out = bs.bootstrap(ck, pre, jnp.int32(gates.MU_1_8))
        return (out.a, out.b), ()
    (a, b), _ = jax.lax.scan(body, (a, b), None, length=steps)
    return a, b


def run(name):
    P = CONFIGS[name]
    kg = jax.jit(keys.keygen, static_argnames=("params",))
    t0 = time.time()
    sk, ck = kg(jax.random.PRNGKey(0), params=P)
    np.asarray(ck.ks_table_limbs[0, :4])  # force
    print(f"[{name}] keygen {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, B))
    fns = {s: jax.jit(functools.partial(chain, steps=s)) for s in (S1, S2)}
    ts = {}
    enc_seed = 100
    for s in (S1, S2):
        # compile + warm on its own inputs (result may be relay-cached; fine)
        ct = gates.encrypt_bits(jax.random.PRNGKey(enc_seed), sk, bits); enc_seed += 1
        t0 = time.time()
        out = fns[s](ck, ct.a, ct.b)
        np.asarray(out[1][:8])
        print(f"[{name}] steps={s} cold(compile+exec) {time.time()-t0:.0f}s", flush=True)
        # timed run on FRESH inputs
        ct = gates.encrypt_bits(jax.random.PRNGKey(enc_seed), sk, bits); enc_seed += 1
        np.asarray(ct.b[:4])  # make sure inputs are resident before timing
        t0 = time.time()
        out = fns[s](ck, ct.a, ct.b)
        np.asarray(out[1][:8])
        ts[s] = time.time() - t0
        if s == S2:
            got = np.asarray(lwe.decrypt_bit(lwe.Lwe(out[0], out[1]), sk.lwe_key))
            ok = (got == np.asarray(bits)).mean()
    dt = (ts[S2] - ts[S1]) / (S2 - S1)
    print(f"[{name}] t1={ts[S1]:.2f}s t4={ts[S2]:.2f}s -> {dt*1e3:.0f} ms/bootstrap-batch"
          f" = {B/dt:,.0f} bs/s  (chain-correct {ok*100:.2f}%)", flush=True)


names = sys.argv[1:] or list(CONFIGS)
for n in names:
    run(n)
