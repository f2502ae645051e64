"""Diagnose the fast-preset error rate: measure post-bootstrap phase error
per config (exact / 3-limb / pallas-rotate / fast) on the live chip.

For each config: one batched AND(x,x) bootstrap on fresh encryptions, then
report the phase-error distribution (stdev, max, decode errors) both BEFORE
the keyswitch (under the extracted key) and AFTER (under the small key).
"""
import dataclasses
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

B = int(os.environ.get("B", "4096"))
MU = gates.MU_1_8


def phase_err(a, b, key_bits, bits):
    """Signed phase error vs +-mu, as fraction of torus."""
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    key_bits = np.asarray(key_bits, np.int64)
    phase = (b - a @ key_bits) & 0xFFFFFFFF
    want = np.where(np.asarray(bits) == 1, MU, (-MU) & 0xFFFFFFFF)
    e = (phase - want) & 0xFFFFFFFF
    e = np.where(e >= 2**31, e - 2**32, e).astype(np.float64) / 2**32
    return e


def report(name, e):
    errs = int((np.abs(e) > 1 / 16).sum())
    print(f"  {name}: stdev={e.std():.6f} max|e|={np.abs(e).max():.6f} "
          f"mean={e.mean():.2e} decode_errs={errs}/{e.size}", flush=True)


def run(tag, params, sk, ck):
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, B)
    ct = gates.encrypt_bits(jax.random.PRNGKey(1), sk, jnp.asarray(bits))
    pre = lwe.Lwe(ct.a * 2, ct.b * 2 + jnp.int32(-MU))

    wo = jax.jit(bs.bootstrap_wo_ks)
    full = jax.jit(bs.bootstrap, static_argnums=())
    t0 = time.time()
    a_ext, b_ext = jax.block_until_ready(wo(ck, pre, jnp.int32(MU)))
    out = jax.block_until_ready(full(ck, pre, jnp.int32(MU)))
    print(f"[{tag}] ({time.time()-t0:.0f}s)", flush=True)
    report("pre-ks ", phase_err(a_ext, b_ext, np.asarray(sk.extracted_key), bits))
    report("post-ks", phase_err(out.a, out.b, np.asarray(sk.lwe_key), bits))


kg = jax.jit(keys.keygen, static_argnames=("params",))

# (l, bgbit, body_limbs) base configs; each measured with XLA and Pallas
# rotate+decompose front-ends.
BASES = [
    (3, 7, 4),
    (2, 8, 4),
    (2, 8, 3),
]
if os.environ.get("DIAG_BASES"):
    BASES = [tuple(map(int, b.split(","))) for b in os.environ["DIAG_BASES"].split(";")]

for l, bgbit, body in BASES:
    P = dataclasses.replace(PEBA1_128, l=l, bgbit=bgbit, bk_body_limbs=body)
    t0 = time.time()
    sk, ck = kg(jax.random.PRNGKey(0), params=P)
    np.asarray(ck.ks_table_limbs[0, :4])
    print(f"keygen l={l} bgbit={bgbit} body={body}: {time.time()-t0:.0f}s", flush=True)
    run(f"l={l} bg=2^{bgbit} body={body} xla-rotate", P, sk, ck)
    Pp = dataclasses.replace(P, use_pallas_rotate=True)
    run(f"l={l} bg=2^{bgbit} body={body} pallas-rotate", Pp, sk,
        ck.replace(params=Pp))
