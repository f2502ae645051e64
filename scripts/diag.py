"""Consolidated on-chip diagnostics for peba1_tpu.

One CLI (modes below, each previously an ad-hoc probe script):

  python scripts/diag.py throughput [config ...]   honest bootstraps/s/chip
  python scripts/diag.py noise                     post-bootstrap phase error
  python scripts/diag.py relay                     relay-timing honesty check
  python scripts/diag.py golden [--out FILE]       cipher golden-corpus run

Relay pitfalls all modes work around (hard-won; see also the verify skill):
the axon relay's jax.block_until_ready does not always block -- only a host
fetch does, with 0.1-0.9 s latency noise -- and repeat executions of the
same executable+inputs return cached results.  Honest timing therefore:
  * times dispatch -> np.asarray(small output) fetched;
  * runs TWO chain lengths S1 < S2 on FRESH inputs each and reports the
    delta (t(S2)-t(S1))/(S2-S1), cancelling fetch noise and constant
    overhead;
  * never trusts a sub-second measurement.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PEBA1_CACHE", "/root/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from peba1_tpu import gates, keys, lwe
from peba1_tpu.ops import bootstrap as bs
from peba1_tpu.params import PEBA1_128, PRESETS
from peba1_tpu.utils.artifacts import atomic_json

MU = gates.MU_1_8

# Throughput configs: the lambda=128 gadget/limb/kernel lever matrix.
CONFIGS = {
    "l3_exact": PEBA1_128,
    "l3_exact_pallas": dataclasses.replace(PEBA1_128, use_pallas_rotate=True),
    "l3_body3": dataclasses.replace(PEBA1_128, bk_body_limbs=3, use_pallas_rotate=True),
    "l2_exact": dataclasses.replace(PEBA1_128, l=2, bgbit=8, use_pallas_rotate=True),
    "l2_body3": dataclasses.replace(
        PEBA1_128, l=2, bgbit=8, bk_body_limbs=3, use_pallas_rotate=True),
    "l2_body3_fused": dataclasses.replace(
        PEBA1_128, l=2, bgbit=8, bk_body_limbs=3, use_fused_cmux=True),
    "l2_body3_fused_k256": dataclasses.replace(
        PEBA1_128, l=2, bgbit=8, bk_body_limbs=3, use_fused_cmux=True,
        amat_block=256),
    "l3_fused": dataclasses.replace(PEBA1_128, use_fused_cmux=True),
    "t2_step": PRESETS["peba1_128_t2"],
    "t2_extprod": dataclasses.replace(
        PRESETS["peba1_128_t2"], use_fused_step=False,
        use_pallas_extprod=True),
    "t2_xla": dataclasses.replace(
        PRESETS["peba1_128_t2"], use_fused_step=False),
    "t2_fused": dataclasses.replace(
        PRESETS["peba1_128_t2"], use_fused_step=False,
        use_pallas_rotate=False, use_fused_cmux=True),
    # Streaming-W fused step: per-step Toeplitz assembled in-graph, no
    # O(n*N^2) bk_w key.  The k=1 lambda=128 family's only fused-step
    # option (bk_w would be 18.5 GB), and a 10.9-GB-smaller-key alternative
    # for the t2 production set.
    "fast_stream": dataclasses.replace(
        PRESETS["peba1_128_fast"], use_fused_step=True, w_streaming=True),
    "t2_stream": dataclasses.replace(
        PRESETS["peba1_128_t2"], w_streaming=True),
    # Generator-streaming fused step (cmux_step_gen): weights assembled in
    # VMEM from bk_tp by strided rolls -- no bk_w key, no per-step W in HBM.
    "fast_gen": PRESETS["peba1_128_fast_gen"],
    "t2_gen": PRESETS["peba1_128_t2_gen"],
    # Whole-rotation variant: generator key + accumulator VMEM-resident
    # across all n steps (blind_rotate_gen_full; N<=1024 sets only).
    "fast_genf": dataclasses.replace(
        PRESETS["peba1_128_fast_gen"], use_gen_full=True),
    "t2_genf": dataclasses.replace(
        PRESETS["peba1_128_t2_gen"], use_gen_full=True),
    # BASELINE config 4: the N=2048 ring.  bk_w cannot exist (~137 GB) and
    # one step's W (134 MB) exceeds VMEM, so the candidates are the XLA
    # GEMM paths (W materialized per step in-graph) and the in-VMEM-assembly
    # kernel (n2048_gen -- the production path).
    "n2048": PRESETS["ring_2048"],
    "n2048_rot": dataclasses.replace(
        PRESETS["ring_2048"], use_pallas_rotate=True),
    # Body truncated to 3 limbs (-12.5% MACs): the body-rounding phase error
    # (~2^-10 over n steps, no key amplification -- see TfheParams.bk_limbs)
    # is even smaller relative to RING_2048's 2^-28 bk noise budget.
    "n2048_body3": dataclasses.replace(
        PRESETS["ring_2048"], bk_body_limbs=3, use_pallas_rotate=True),
    "n2048_gen": PRESETS["ring_2048_gen"],
    "n2048_gen_body4": dataclasses.replace(
        PRESETS["ring_2048_gen"], bk_body_limbs=4),
}


def _keygen(P):
    kg = jax.jit(keys.keygen, static_argnames=("params",))
    t0 = time.time()
    sk, ck = kg(jax.random.PRNGKey(0), params=P)
    np.asarray(ck.ks_table_limbs[0, :4])  # force residency
    return sk, ck, time.time() - t0


def _chain(ck, a, b, *, steps):
    """`steps` serialized identity bootstraps: AND(x, x) = x."""
    def body(c, _):
        pre = lwe.Lwe(c[0] * 2, c[1] * 2 + jnp.int32(-MU))
        out = bs.bootstrap(ck, pre, jnp.int32(MU))
        return (out.a, out.b), ()
    (a, b), _ = jax.lax.scan(body, (a, b), None, length=steps)
    return a, b


# ---------------------------------------------------------------- throughput
def mode_throughput(args):
    """Honest bs/s per config: two chain lengths on fresh inputs, delta
    timing, and bench.py-grade discipline -- each length timed `reps` times
    (fresh inputs each) taking the MIN (the jitter is all positive: relay
    fetch latency + host noise).

    --chunk-steps caps the bootstraps per XLA dispatch: a chain longer than
    the chunk executes as several dispatches with a host fetch between them
    (same watchdog-safe pattern as campaign mode).  Required at N=2048,
    where a single 4-step dispatch is a multi-minute XLA execution that
    crashes the TPU worker (runs/lever.log); the delta timing still cancels
    the (now per-chunk) dispatch+fetch overhead to first order because both
    chain lengths pay it per chunk.
    """
    B = args.batch
    S1, S2 = args.s1, args.s2
    rows = []
    for name in (args.configs or list(CONFIGS)):
        P = CONFIGS[name] if name in CONFIGS else PRESETS[name]
        sk, ck, dt = _keygen(P)
        print(f"[{name}] keygen {dt:.0f}s", flush=True)
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, B))
        cs = min(args.chunk_steps or S2, S2)
        # One jitted fn per distinct dispatch size, built ONCE: a fresh
        # jax.jit(partial(...)) per call would re-trace every time (~0.5 s of
        # Python overhead that lands only in the short chain and inflates the
        # delta rate ~10-25% -- the bug behind the r4 24k-vs-13.7k confusion).
        sizes = {cs} | {s % cs or cs for s in (S1, S2)}
        fns = {z: jax.jit(functools.partial(_chain, steps=z)) for z in sizes}

        def run_chain(a, b, steps):
            done = 0
            while done < steps:
                step = min(cs, steps - done)
                a, b = fns[step](ck, a, b)
                np.asarray(b[:8])  # host fetch = dispatch boundary
                done += step
            return a, b

        ts, ok, enc_seed = {}, float("nan"), 100
        for s in (S1, S2):
            # compile + warm on its own inputs (result may be relay-cached)
            ct = gates.encrypt_bits(jax.random.PRNGKey(enc_seed), sk, bits)
            enc_seed += 1
            t0 = time.time()
            out = run_chain(ct.a, ct.b, s)
            print(f"[{name}] steps={s} cold(compile+exec) {time.time()-t0:.0f}s",
                  flush=True)
            # timed runs on FRESH inputs each; min over reps
            best = float("inf")
            for r in range(args.reps):
                ct = gates.encrypt_bits(jax.random.PRNGKey(enc_seed), sk, bits)
                enc_seed += 1
                np.asarray(ct.b[:4])
                t0 = time.time()
                out = run_chain(ct.a, ct.b, s)
                best = min(best, time.time() - t0)
            ts[s] = best
            if s == S2:
                got = np.asarray(lwe.decrypt_bit(lwe.Lwe(out[0], out[1]), sk.lwe_key))
                ok = (got == np.asarray(bits)).mean()
        dt = (ts[S2] - ts[S1]) / (S2 - S1)
        print(f"[{name}] t1={ts[S1]:.2f}s t{S2}={ts[S2]:.2f}s -> "
              f"{dt*1e3:.0f} ms/bootstrap-batch = {B/dt:,.0f} bs/s  "
              f"(chain-correct {ok*100:.2f}%)", flush=True)
        rows.append({"config": name, "t_s1": round(ts[S1], 3),
                     "t_s2": round(ts[S2], 3),
                     "chunk_steps": cs,
                     "bootstraps_per_s": round(B / dt, 1),
                     "chain_correct_frac": float(ok)})
        # Incremental write: keep the configs measured so far if a later
        # keygen/run dies or the relay stalls.
        if args.out:
            atomic_json(args.out, {
                "metric": "throughput_lever_matrix", "batch": B,
                "chain_lengths": [S1, S2], "reps": args.reps,
                "rows": rows, "device": str(jax.devices()[0])})


# --------------------------------------------------------------------- noise
def _phase_err(a, b, key_bits, bits):
    """Signed phase error vs +-mu, as fraction of torus."""
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    key_bits = np.asarray(key_bits, np.int64)
    phase = (b - a @ key_bits) & 0xFFFFFFFF
    want = np.where(np.asarray(bits) == 1, MU, (-MU) & 0xFFFFFFFF)
    e = (phase - want) & 0xFFFFFFFF
    e = np.where(e >= 2**31, e - 2**32, e).astype(np.float64) / 2**32
    return e


def _noise_report(name, e):
    errs = int((np.abs(e) > 1 / 16).sum())
    print(f"  {name}: stdev={e.std():.6f} max|e|={np.abs(e).max():.6f} "
          f"mean={e.mean():.2e} decode_errs={errs}/{e.size}", flush=True)
    return {"stdev": float(e.std()), "max": float(np.abs(e).max()),
            "decode_errs": errs, "n": int(e.size)}


def mode_noise(args):
    B = args.batch
    bases = [dict(l=3, bgbit=7, bk_body_limbs=4),
             dict(l=2, bgbit=8, bk_body_limbs=3),
             dict(l=2, bgbit=8, bk_body_limbs=3, k=2, N=512)]
    for kw in bases:
        P = dataclasses.replace(PEBA1_128, **kw)
        sk, ck, dt = _keygen(P)
        print(f"keygen {kw}: {dt:.0f}s", flush=True)
        for tag, Pv in [("xla-rotate", P),
                        ("pallas-rotate",
                         dataclasses.replace(P, use_pallas_rotate=True))]:
            ckv = ck.replace(params=Pv)
            rng = np.random.default_rng(0)
            bits = rng.integers(0, 2, B)
            ct = gates.encrypt_bits(jax.random.PRNGKey(1), sk, jnp.asarray(bits))
            pre = lwe.Lwe(ct.a * 2, ct.b * 2 + jnp.int32(-MU))
            t0 = time.time()
            a_ext, b_ext = jax.block_until_ready(
                jax.jit(bs.bootstrap_wo_ks)(ckv, pre, jnp.int32(MU)))
            out = jax.block_until_ready(
                jax.jit(bs.bootstrap)(ckv, pre, jnp.int32(MU)))
            print(f"[{kw} {tag}] ({time.time()-t0:.0f}s)", flush=True)
            _noise_report("pre-ks ", _phase_err(
                a_ext, b_ext, np.asarray(sk.extracted_key), bits))
            _noise_report("post-ks", _phase_err(
                out.a, out.b, np.asarray(sk.lwe_key), bits))


# ------------------------------------------------------------------ campaign
def mode_campaign(args):
    """Statistical per-gate error campaign at real parameters on the chip.

    Runs `steps` CHAINED batched identity bootstraps (AND(x,x) = x) on
    `batch` fresh encryptions -- batch*steps serialized gate evaluations,
    every intermediate output feeding the next gate, so any mid-chain decode
    error flips downstream bits and lands in `chain_error_frac`.  The final
    outputs' phase-error distribution (under the small key) is the
    steady-state per-gate error; the JSON artifact records sigma, max|e|,
    the 1/16 decoding margin in sigma units, and the implied Gaussian
    per-gate error bound.  tests/test_noise.py pins the committed artifact.
    """
    P = PRESETS[args.params]
    sk, ck, dt = _keygen(P)
    print(f"keygen {dt:.0f}s", flush=True)
    B, S = args.batch, args.steps
    # One giant S-step dispatch is a multi-minute single XLA execution --
    # long enough to trip the TPU runtime / relay watchdog (observed worker
    # crash at S=1280).  Chain in chunk_steps-sized dispatches instead,
    # syncing every few chunks so the async queue stays shallow.
    cs = min(args.chunk_steps, S)
    n_chunks = -(-S // cs)
    S = n_chunks * cs
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, B)
    fn = jax.jit(functools.partial(_chain, steps=cs))
    ct = gates.encrypt_bits(jax.random.PRNGKey(321), sk, jnp.asarray(bits))
    t0 = time.time()

    import math

    def make_record(a_host, b_host, steps_done, dt):
        # Every bootstrap refreshes noise, so the mid-chain output phase
        # distribution IS the steady state: a partial chain is simply a
        # smaller (still valid) campaign.
        e = _phase_err(a_host, b_host, np.asarray(sk.lwe_key), bits)
        got = (np.asarray(lwe.decrypt_bit(
            lwe.Lwe(jnp.asarray(a_host), jnp.asarray(b_host)), sk.lwe_key))
            == bits)
        sigma = float(e.std())
        margin = 1 / 16
        per_gate = math.erfc(margin / sigma / math.sqrt(2))
        return {
            "metric": "chained_gate_error_campaign",
            "params": args.params,
            "gates": int(B) * int(steps_done),
            "batch": int(B), "chain_steps": int(steps_done),
            "chain_error_frac": float(1 - got.mean()),
            "phase_sigma": round(sigma, 6),
            "phase_max_abs": round(float(np.abs(e).max()), 6),
            "margin": margin,
            "margin_sigmas": round(margin / sigma, 2),
            "gaussian_per_gate_error_bound": float(f"{per_gate:.3e}"),
            "final_decode_errs": int((np.abs(e) > margin).sum()),
            "seconds": round(dt, 1),
            "device": str(jax.devices()[0]),
        }

    a, b = ct.a, ct.b
    for i in range(n_chunks):
        a, b = fn(ck, a, b)
        if (i + 1) % 4 == 0 or i == n_chunks - 1:
            np.asarray(b[:1])  # host fetch = real barrier
            print(f"  chunk {i + 1}/{n_chunks} "
                  f"({(i + 1) * cs * B / 1e6:.1f}M gates, "
                  f"{time.time() - t0:.0f}s)", flush=True)
        # Relay stalls have been observed to wedge a single RPC for >15 min;
        # checkpoint a valid partial artifact periodically so a hang or
        # timeout cannot lose the whole run.
        if args.out and ((i + 1) % 16 == 0) and i != n_chunks - 1:
            rec = make_record(np.asarray(a), np.asarray(b), (i + 1) * cs,
                              time.time() - t0)
            atomic_json(args.out, rec)
            print(f"  checkpointed {rec['gates']/1e6:.1f}M-gate artifact",
                  flush=True)

    rec = make_record(np.asarray(a), np.asarray(b), S, time.time() - t0)
    print(json.dumps(rec), flush=True)
    if args.out:
        atomic_json(args.out, rec)


# --------------------------------------------------------------------- relay
def mode_relay(args):
    """block_until_ready vs host-fetch timing at two chain lengths: if the
    former scales with length like the latter, it actually blocks here."""
    B, S1, S2 = args.batch, 1, 5
    P = PRESETS[args.params]
    sk, ck, _ = _keygen(P)
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, B))
    fns = {s: jax.jit(functools.partial(_chain, steps=s)) for s in (S1, S2)}
    seed = 50
    for s in (S1, S2):
        ct = gates.encrypt_bits(jax.random.PRNGKey(seed), sk, bits); seed += 1
        np.asarray(fns[s](ck, ct.a, ct.b)[1][:4])  # compile/warm
    for label, finish in [("block_until_ready", jax.block_until_ready),
                          ("host-fetch", lambda o: np.asarray(o[1][:4]))]:
        for s in (S1, S2):
            ct = gates.encrypt_bits(jax.random.PRNGKey(seed), sk, bits); seed += 1
            np.asarray(ct.b[:4])
            t0 = time.time()
            finish(fns[s](ck, ct.a, ct.b))
            print(f"[{label}] steps={s}: {time.time()-t0:.2f}s", flush=True)


# -------------------------------------------------------------------- golden
def mode_golden(args):
    """Evaluate the frozen golden conformance corpus with the CIPHER circuit
    at full protocol width on the chip; write the decision-equality artifact."""
    from peba1_tpu import conformance as cf

    corpus = cf.load_corpus(args.corpus)
    P = PRESETS[args.params]
    sk, ck, dt = _keygen(P)
    print(f"keygen {dt:.0f}s; corpus n={corpus['n_cases']} "
          f"nslots={corpus['nslots']} bitsize={corpus['bitsize']}", flush=True)
    t0 = time.time()
    got_b, got_y = cf.eval_cipher(sk, ck, corpus, jax.random.PRNGKey(9),
                                  batch=args.corpus_batch)
    dt = time.time() - t0
    _, _, _, _, _, want_b, want_y = cf.corpus_arrays(corpus)
    rec = {
        "metric": "golden_corpus_decision_equality",
        "params": args.params,
        "n_cases": int(len(want_b)),
        "nslots": corpus["nslots"], "bitsize": corpus["bitsize"],
        "b_equal": int((got_b == want_b).sum()),
        "y_equal": int((got_y == want_y).sum()),
        "all_equal": bool((got_b == want_b).all() and (got_y == want_y).all()),
        "seconds": round(dt, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec), flush=True)
    if args.out:
        atomic_json(args.out, rec, indent=None)
    if not rec["all_equal"]:
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="mode", required=True)
    t = sub.add_parser("throughput")
    t.add_argument("configs", nargs="*", choices=[[], *CONFIGS],
                   metavar="config")
    t.add_argument("--batch", type=int, default=int(os.environ.get("B", 8192)))
    t.add_argument("--reps", type=int, default=3,
                   help="timed repetitions per chain length (min taken)")
    t.add_argument("--chunk-steps", type=int, default=None,
                   help="bootstraps per dispatch (watchdog-safe chunking; "
                        "default: whole chain in one dispatch)")
    t.add_argument("--s1", type=int, default=1)
    t.add_argument("--s2", type=int, default=4,
                   help="chain lengths for the delta; longer chains shrink "
                        "the per-dispatch-overhead noise floor (the S1=1 "
                        "fetch overhead is 0.4-0.9s and varies between "
                        "reps, so short-chain deltas can swing +-30%)")
    t.add_argument("--out", default=None, help="write the lever-matrix JSON")
    n = sub.add_parser("noise")
    n.add_argument("--batch", type=int, default=int(os.environ.get("B", 4096)))
    cp = sub.add_parser("campaign")
    cp.add_argument("--params", default="peba1_128_t2_gen",
                    choices=sorted(PRESETS))
    cp.add_argument("--batch", type=int, default=8192)
    cp.add_argument("--steps", type=int, default=128)
    cp.add_argument("--chunk-steps", type=int, default=16,
                    help="bootstraps per dispatch (watchdog-safe chunking)")
    cp.add_argument("--out", default=None)
    r = sub.add_parser("relay")
    r.add_argument("--batch", type=int, default=4096)
    r.add_argument("--params", default="peba1_128_t2_gen",
                   choices=sorted(PRESETS))
    g = sub.add_parser("golden")
    g.add_argument("--params", default="peba1_128_t2_gen",
                   choices=sorted(PRESETS))
    g.add_argument("--corpus", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "data", "golden_corpus.json"))
    g.add_argument("--corpus-batch", type=int, default=16)
    g.add_argument("--out", default=None)
    args = ap.parse_args()
    {"throughput": mode_throughput, "noise": mode_noise,
     "campaign": mode_campaign, "relay": mode_relay,
     "golden": mode_golden}[args.mode](args)


if __name__ == "__main__":
    main()
