"""On-chip repro + isolation for the N=2048 plain-XLA rotate TPU miscompile.

LEVER_r04.json first documented it: at RING_2048 the plain-XLA barrel-rotate
path (ops/rotate.negacyclic_rotate inside the blind-rotation scan) decodes
~50% of gate bootstraps wrong ON TPU ONLY -- CPU is bit-exact, and every
Pallas variant (rotate_decompose, cmux_step_gen, ...) is bit-exact on both.
ops/bootstrap._upgrade_rotate_on_tpu now quarantines the path (auto-upgrade
to the Pallas rotate); this script demonstrates the fault and narrows it.

Stages (each vs an exact pure-numpy oracle, results in the --out JSON):
  A  isolated negacyclic_rotate, one shot            (B, k+1, N) x (B,)
  B  rotate chained in lax.scan (64 steps)           acc <- X^amt * acc
  C  the real step dataflow minus the GEMM: rotate, subtract, gadget-
     decompose; digit checksum carried through the scan so nothing is DCE'd
  D  end-to-end gate bootstraps at ring_2048: plain path (via
     PEBA1_ALLOW_XLA_ROTATE_N2048=1), Pallas-rotate variant, and the
     auto-upgrade guard path -- expected ~0.5 / 1.0 / 1.0 correct

For the smallest failing stage the jitted function's StableHLO and (when the
relay allows) compiled HLO are dumped to --hlo-dir for upstream reporting.

Run on the chip:   python scripts/repro_n2048_rotate.py --out REPRO_n2048.json
Control on CPU:    python scripts/repro_n2048_rotate.py --platform cpu --skip-e2e
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PEBA1_CACHE", "/root/jax_cache"))
import jax.numpy as jnp
import numpy as np

from peba1_tpu.ops import decompose as dec
from peba1_tpu.ops import rotate
from peba1_tpu.params import RING_2048, PRESETS


def np_negacyclic_rotate(x: np.ndarray, amt: np.ndarray) -> np.ndarray:
    """Oracle: X^amt * p over Z[X]/(X^N+1), per batch row."""
    N = x.shape[-1]
    out = np.empty_like(x)
    flat = x.reshape(-1, N)
    amts = np.broadcast_to(
        amt.reshape(amt.shape + (1,) * (x.ndim - 1 - amt.ndim)),
        x.shape[:-1]).reshape(-1)
    o = out.reshape(-1, N)
    for r in range(flat.shape[0]):
        a = int(amts[r]) % (2 * N)
        neg = a >= N
        a %= N
        y = np.roll(flat[r], a)
        if a:
            y[:a] = -y[:a]
        o[r] = -y if neg else y
    return out


def np_decompose(x: np.ndarray, p) -> np.ndarray:
    u = x.astype(np.uint32) + np.uint32(dec.gadget_offset(p))
    ds = []
    for q in range(1, p.l + 1):
        d = (u >> np.uint32(32 - q * p.bgbit)) & np.uint32(p.bg - 1)
        ds.append((d.astype(np.int32) - p.half_bg).astype(np.int8))
    return np.stack(ds, axis=-1)


def fetch(x):
    return np.asarray(x)


def dump_hlo(fn, args_, hlo_dir, name):
    os.makedirs(hlo_dir, exist_ok=True)
    low = jax.jit(fn).lower(*args_)
    with open(os.path.join(hlo_dir, f"{name}.stablehlo.txt"), "w") as f:
        f.write(low.as_text())
    try:
        with open(os.path.join(hlo_dir, f"{name}.compiled.txt"), "w") as f:
            f.write(low.compile().as_text())
    except Exception as e:  # the relay may not expose compiled HLO
        print(f"[hlo] compiled text unavailable for {name}: {e}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="REPRO_n2048.json")
    ap.add_argument("--hlo-dir", default="runs/repro_n2048")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip-e2e", action="store_true",
                    help="stages A-C only (no keygen; for the CPU control)")
    ap.add_argument("--skip-chain", action="store_true",
                    help="skip stage E (large-batch chained-scan context)")
    ap.add_argument("--chain-batch", type=int, default=8192)
    # 2 steps keeps the single dispatch ~30 s at the plain path's ~500 bs/s
    # (multi-minute dispatches have crashed the TPU-worker watchdog).
    ap.add_argument("--chain-steps", type=int, default=2)
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    p = RING_2048
    N, K = p.N, p.k + 1
    B = args.batch
    rng = np.random.default_rng(0)
    rec = {"metric": "n2048_rotate_miscompile_repro",
           "device": str(jax.devices()[0]), "N": N, "batch": B,
           "stages": {}}

    x0 = rng.integers(-2**31, 2**31, (B, K, N), dtype=np.int64).astype(np.int32)
    amts = rng.integers(0, 2 * N, (args.steps, B), dtype=np.int64).astype(np.int32)

    # -- stage A: one isolated rotate --------------------------------------
    def stage_a(x, a):
        return rotate.negacyclic_rotate(x, a[:, None])
    got = fetch(jax.jit(stage_a)(x0, amts[0]))
    want = np_negacyclic_rotate(x0, amts[0])
    frac_a = float((got == want).mean())
    rec["stages"]["A_isolated_rotate"] = {"match_frac": frac_a}
    print(f"[A] isolated rotate match: {frac_a}", flush=True)
    if frac_a < 1.0:
        dump_hlo(stage_a, (x0, amts[0]), args.hlo_dir, "A_isolated_rotate")

    # -- stage B: rotate chained through lax.scan --------------------------
    def stage_b(x, aa):
        def step(acc, a):
            return rotate.negacyclic_rotate(acc, a[:, None]), ()
        acc, _ = jax.lax.scan(step, x, aa)
        return acc
    got = fetch(jax.jit(stage_b)(x0, amts))
    want = x0
    for s in range(args.steps):
        want = np_negacyclic_rotate(want, amts[s])
    frac_b = float((got == want).mean())
    rec["stages"]["B_rotate_scan"] = {"steps": args.steps, "match_frac": frac_b}
    print(f"[B] {args.steps}-step rotate scan match: {frac_b}", flush=True)
    if frac_b < 1.0 and frac_a == 1.0:
        dump_hlo(stage_b, (x0, amts), args.hlo_dir, "B_rotate_scan")

    # -- stage C: the real step dataflow minus the GEMM --------------------
    def stage_c(x, aa):
        def step(carry, a):
            acc, chk = carry
            rot = rotate.negacyclic_rotate(acc, a[:, None])
            diff = rot - acc
            d = dec.decompose(diff, p)
            chk = chk + jnp.sum(d.astype(jnp.int32), axis=(-3, -2, -1))
            return (rot, chk), ()
        (acc, chk), _ = jax.lax.scan(step, (x, jnp.zeros((B,), jnp.int32)), aa)
        return acc, chk
    got_acc, got_chk = (fetch(v) for v in jax.jit(stage_c)(x0, amts))
    want_acc, want_chk = x0, np.zeros((B,), np.int64)
    for s in range(args.steps):
        rot = np_negacyclic_rotate(want_acc, amts[s])
        d = np_decompose((rot - want_acc).astype(np.int32), p)
        want_chk += d.astype(np.int64).sum(axis=(1, 2, 3))
        want_acc = rot
    frac_c_acc = float((got_acc == want_acc).mean())
    frac_c_chk = float((got_chk == (want_chk & 0xFFFFFFFF).astype(np.uint32)
                        .astype(np.int32)).mean())
    rec["stages"]["C_step_dataflow"] = {
        "steps": args.steps, "acc_match_frac": frac_c_acc,
        "digit_checksum_match_frac": frac_c_chk}
    print(f"[C] step-dataflow acc match: {frac_c_acc}, "
          f"digit checksum match: {frac_c_chk}", flush=True)
    if (frac_c_acc < 1.0 or frac_c_chk < 1.0) and frac_b == 1.0:
        dump_hlo(stage_c, (x0, amts), args.hlo_dir, "C_step_dataflow")

    # -- stage D: end-to-end gate bootstraps at ring_2048 ------------------
    if not args.skip_e2e:
        from peba1_tpu import gates, keys

        t0 = time.time()
        sk, ck = jax.jit(keys.keygen, static_argnames=("params",))(
            jax.random.PRNGKey(0), params=p)
        fetch(ck.ks_table_limbs[0, :4])
        print(f"[D] keygen {time.time() - t0:.0f}s", flush=True)
        bits = rng.integers(0, 2, B).astype(np.int32)
        ct = gates.encrypt_bits(jax.random.PRNGKey(1), sk, jnp.asarray(bits))

        def decode_frac(ck_v, tag):
            out = gates.lincomb_bootstrap(ck_v, ct, ct, 1, 1, -gates.MU_1_8)
            got = fetch(gates.decrypt_bits(out, sk))
            frac = float((got == bits).mean())
            print(f"[D] {tag}: decode_frac={frac}", flush=True)
            return frac

        # plain XLA rotate, quarantine bypassed (the faulty path)
        os.environ["PEBA1_ALLOW_XLA_ROTATE_N2048"] = "1"
        rec["stages"]["D_plain_xla_rotate"] = {
            "decode_frac": decode_frac(ck, "plain XLA rotate (env bypass)")}
        del os.environ["PEBA1_ALLOW_XLA_ROTATE_N2048"]

        # Pallas rotate (the known-good kernel)
        p_pal = dataclasses.replace(p, use_pallas_rotate=True)
        rec["stages"]["D_pallas_rotate"] = {
            "decode_frac": decode_frac(ck.replace(params=p_pal),
                                       "pallas rotate")}

        # the quarantine guard itself (plain params, no bypass -> upgraded).
        # max_stdev nudge: same math, but a distinct params hash so the jit
        # cache cannot return the env-bypass executable traced above.
        p_guard = dataclasses.replace(p, max_stdev=p.max_stdev * (1 + 1e-12))
        rec["stages"]["D_guard_auto_upgrade"] = {
            "decode_frac": decode_frac(ck.replace(params=p_guard),
                                       "guard auto-upgrade")}

        # -- stage E: LEVER_r04's exact context -- CHAINED bootstraps in a
        # lax.scan at large batch (the conditions under which the ~50%
        # decode fault was observed; stage D's single-gate B=256 form did
        # NOT reproduce it in r5).
        if not args.skip_chain:
            B2 = args.chain_batch
            bits2 = rng.integers(0, 2, B2).astype(np.int32)
            ct2 = gates.encrypt_bits(jax.random.PRNGKey(2), sk,
                                     jnp.asarray(bits2))

            from peba1_tpu import lwe as lwe_mod
            from peba1_tpu.ops import bootstrap as bs_mod

            @jax.jit
            def chain2(ck_v, a, b):
                def body(c, _):
                    pre = lwe_mod.Lwe(c[0] * 2,
                                      c[1] * 2 + jnp.int32(-gates.MU_1_8))
                    out = bs_mod.bootstrap(ck_v, pre, jnp.int32(gates.MU_1_8))
                    return (out.a, out.b), ()
                (a, b), _ = jax.lax.scan(body, (a, b), None,
                                         length=args.chain_steps)
                return a, b

            os.environ["PEBA1_ALLOW_XLA_ROTATE_N2048"] = "1"
            t0 = time.time()
            a2, b2 = chain2(ck, ct2.a, ct2.b)
            got2 = fetch(gates.decrypt_bits(lwe_mod.Lwe(a2, b2), sk))
            frac_e = float((got2 == bits2).mean())
            del os.environ["PEBA1_ALLOW_XLA_ROTATE_N2048"]
            rec["stages"]["E_chained_scan_plain_rotate"] = {
                "batch": B2, "chain_steps": args.chain_steps,
                "decode_frac": frac_e,
                "seconds": round(time.time() - t0, 1)}
            print(f"[E] chained plain-rotate scan (B={B2}, "
                  f"{args.chain_steps} steps): decode_frac={frac_e}",
                  flush=True)
            if frac_e < 1.0:
                os.environ["PEBA1_ALLOW_XLA_ROTATE_N2048"] = "1"
                try:
                    dump_hlo(chain2, (ck, ct2.a, ct2.b), args.hlo_dir,
                             "E_chained_scan_plain_rotate")
                finally:
                    del os.environ["PEBA1_ALLOW_XLA_ROTATE_N2048"]

    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
