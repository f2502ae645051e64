"""Reference-style driver: reproduces the peba1 binary's self-test suite.

TPU-native equivalent of /root/reference/src/main.cpp:10-609 -- key setup,
test-vector generation, encrypt/decrypt round-trip gate, plaintext suite,
ciphertext suite, and the full encrypted protocol run, with per-phase wall
timings.  Where the reference loops 128 times over single ops
(src/main.cpp:102), we run the 128 cases as ONE batch (that is the point).

Run:  python -m peba1_tpu [--params toy|peba1_128] [--nslots N] [--bitsize B]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import circuits as cc
from . import clear, gates, keys
from .backends import CipherBackend
from .params import PRESETS, ProtocolParams
from .protocol import ClientDevice, Server
from .utils.bits import bits_to_int, int_to_bits


class _Timer:
    def __init__(self):
        self.t = time.time()

    def lap(self) -> float:
        now = time.time()
        dt = now - self.t
        self.t = now
        return dt


def run(params_name: str = "toy", nslots: int = 128, bitsize: int = 8,
        loop: int = 128, seed: int = 42, skip_cipher_suite: bool = False) -> dict:
    results: dict = {}
    tfhe = PRESETS[params_name]
    proto = ProtocolParams(nslots=nslots, bitsize=bitsize,
                           max_bitsize=3 * bitsize, mul_width=3 * bitsize - 1,
                           bound_match=nslots * 2)
    tm = _Timer()

    # --- key/param setup (src/main.cpp:20-23) ---------------------------
    key = jax.random.PRNGKey(seed)
    k_gen, k_enc, k_auth = jax.random.split(key, 3)
    sk, ck = keys.keygen(k_gen, tfhe)
    jax.block_until_ready(ck.ks_table_limbs)
    print(f"[keys] generated ({params_name}) in {tm.lap():.1f}s")

    # --- test vectors (src/main.cpp:30-42) ------------------------------
    rng = np.random.default_rng(seed)
    hi = (1 << bitsize) - 1
    template = rng.integers(1, hi, nslots)
    sample_true = template + 1                      # ED = nslots
    sample_false = rng.integers(1, hi + 1, nslots)
    print(f"[vectors] nslots={nslots} bitsize={bitsize}")

    # --- enc/dec round-trip gate (src/main.cpp:51-94) -------------------
    client = ClientDevice(7, sk, ck, proto)
    server = Server(ck, proto)
    ks = jax.random.split(k_enc, 4)
    enc_template = client.encrypt_vector(ks[0], template)
    enc_true = client.encrypt_vector(ks[1], sample_true)
    enc_false = client.encrypt_vector(ks[2], sample_false)
    ok = ((client.decrypt_word(enc_template) == template).all()
          and (client.decrypt_word(enc_true) == sample_true).all()
          and (client.decrypt_word(enc_false) == sample_false).all())
    results["roundtrip"] = bool(ok)
    print(f"[enc/dec] correctness {'succeeds' if ok else 'FAILS'} ({tm.lap():.1f}s)")
    if not ok:
        raise SystemExit("encryption round-trip failed")

    # --- plaintext suite (src/main.cpp:107-290) -------------------------
    t64 = template.astype(np.uint64)
    s64 = sample_true.astype(np.uint64)
    r1i = rng.integers(0, nslots, loop)
    checks = {
        "add": (clear.add_nbit(t64[r1i], s64[r1i % nslots], 64) == t64[r1i] + s64[r1i % nslots]).mean(),
        "twos_complement": (clear.twos_complement(s64, 64) == (-s64)).mean(),
        "abs": (clear.abs_(s64, 64) == s64).mean(),
        "sub": (clear.sub_nbit(t64, s64, 64) == np.abs(t64.astype(np.int64) - s64.astype(np.int64)).astype(np.uint64)).mean(),
        "multiply": (clear.multiply(t64, s64, bitsize) == t64 * s64).mean(),
        "manhattan": float(clear.manhattan_distance_bitwise(t64, s64, 64) == clear.manhattan_distance(template, sample_true)),
        "euclidean": float(clear.euclidean_distance_bitwise(t64, s64, 64) == clear.euclidean_distance(template, sample_true)),
    }
    results["plaintext_suite"] = {k: float(v) for k, v in checks.items()}
    all_ok = all(v == 1.0 for v in checks.values())
    print(f"[plaintext suite] {'all pass' if all_ok else checks} ({tm.lap():.3f}s)")

    bound = int(proto.bound_match)
    f_clear = clear.function_f_clear(t64, s64, bound, 64)
    y_clear = clear.function_g_clear(f_clear, 17, 99, 64)
    results["protocol_clear"] = {"f": int(f_clear), "y==r1": bool(y_clear == 99)}
    print(f"[plaintext protocol] f={int(f_clear)} (ED={int(clear.euclidean_distance(template, sample_true))} vs bound={bound})")

    # --- ciphertext suite (src/main.cpp:296-465), batched ---------------
    if not skip_cipher_suite:
        be = CipherBackend(ck)
        m = min(loop, nslots)
        ta = enc_template[:m]
        fb = enc_false[:m]
        s, _ = cc.add_n(be, ta, fb, bitsize)
        add_ok = (bits_to_int(np.asarray(gates.decrypt_bits(s, sk)))
                  == (template[:m] + sample_false[:m]) % (1 << bitsize)).mean()
        print(f"[cipher] add: {add_ok*100:.1f}% ({tm.lap():.1f}s, {be.launches} launches)")
        sub = cc.sub_abs(be, ta, fb, bitsize)
        sub_ok = (bits_to_int(np.asarray(gates.decrypt_bits(sub, sk)))
                  == np.abs(template[:m].astype(int) - sample_false[:m].astype(int))).mean()
        print(f"[cipher] sub_abs: {sub_ok*100:.1f}% ({tm.lap():.1f}s)")
        mul = cc.multiply(be, ta, fb, bitsize, length=proto.mul_width)
        mul_ok = (bits_to_int(np.asarray(gates.decrypt_bits(mul, sk)))
                  == (template[:m].astype(np.int64) * sample_false[:m]) % (1 << proto.mul_width)).mean()
        print(f"[cipher] multiply: {mul_ok*100:.1f}% ({tm.lap():.1f}s)")
        results["cipher_suite"] = {"add": float(add_ok), "sub": float(sub_ok), "mul": float(mul_ok)}

    # --- encrypted protocol (src/main.cpp:513-586) ----------------------
    rec = client.enroll(jax.random.fold_in(k_enc, 9), template)
    server.register(rec)
    enc_bound = client.encrypt_word(jax.random.fold_in(k_enc, 10), bound, 3 * bitsize)
    t0 = time.time()
    res = server.authenticate(k_auth, enc_true, rec.template_ct, enc_bound)
    jax.block_until_ready(res.enc_y.b)
    t_auth = time.time() - t0
    y = client.prove(res.enc_y)
    b = int(client.decrypt_word(res.enc_b))
    v = server.verify_proof(res, y)
    ed = int(clear.euclidean_distance(template, sample_true))
    results["protocol"] = {
        "ed": ed, "bound": bound, "b": b,
        "y": int(y), "r0": int(res.r0), "r1": int(res.r1),
        "reference_verdict(y==r1)": bool(v["reference_verdict"]),
        "is_match": bool(v["is_match"]),
        "seconds": t_auth,
    }
    expect_b = 1 if ed > bound else 0
    status = "OK" if b == expect_b else "MISMATCH"
    print(f"[protocol] ED={ed} bound={bound} b={b} ({status}); y={int(y)} "
          f"r0={int(res.r0)} r1={int(res.r1)}; Function_f+g in {t_auth:.1f}s")
    print(f"[protocol] faithful driver verdict (y==r1): {bool(v['reference_verdict'])}; "
          f"semantic is_match: {bool(v['is_match'])}")
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description="PEBA1-on-TPU reference-style driver")
    ap.add_argument("--params", default="toy", choices=sorted(PRESETS))
    ap.add_argument("--nslots", type=int, default=8)
    ap.add_argument("--bitsize", type=int, default=4)
    ap.add_argument("--loop", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--skip-cipher-suite", action="store_true")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force a JAX backend (this machine's sitecustomize "
                         "pins jax_platforms, so env vars are ignored)")
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    run(args.params, args.nslots, args.bitsize, args.loop, args.seed,
        args.skip_cipher_suite)


if __name__ == "__main__":
    main()
