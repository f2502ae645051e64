"""Operational-scale 1:N identification sweep (BASELINE config 3) on-chip.

Drives sweep.IdentifySweep -- the checkpoint/resume engine -- at full
protocol width: one encrypted probe against N enrolled templates, chunked
into batched Server.identify launches, every chunk's encrypted decision
words checkpointed to disk (atomic writes, content-fingerprinted).  Re-run
the same command after an interrupt (Ctrl-C, relay stall, preemption) and it
resumes at the first missing chunk; the artifact records how many chunks
were computed vs resumed so the resume path is *demonstrated*, not assumed.

Everything is deterministic from --seed: templates, probe, encryption keys.
The artifact (--out) is rewritten atomically after EVERY chunk, so a kill at
any point leaves a valid partial record; on completion the chunks are
collected, decrypted, and verified against the plaintext distances.

  python scripts/sweep_identify.py --n-templates 1024 --chunk 64 \
      --dir runs/sweep_r04 --out SWEEP_r04.json

Expected cadence at full width on one v5e: ~2.2e5 gate bootstraps per
template (SURVEY.md section 3.6) at the BENCH_r04 rate -> tens of seconds
per template, ~4.5 h for 1024 templates.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PEBA1_CACHE", "/root/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from peba1_tpu import keys, sweep
from peba1_tpu.params import PRESETS, ProtocolParams
from peba1_tpu.protocol import ClientDevice, Server
from peba1_tpu.utils.artifacts import atomic_json
from peba1_tpu.utils.logging import stderr_log


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="peba1_128_t2_gen",
                    choices=sorted(PRESETS))
    ap.add_argument("--n-templates", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--nslots", type=int, default=128)
    ap.add_argument("--bitsize", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dir", default="runs/sweep_r04")
    ap.add_argument("--out", default=None)
    ap.add_argument("--max-chunks", type=int, default=0,
                    help="stop after computing this many NEW chunks this "
                         "process (0 = run to completion); used to stage a "
                         "deliberate interrupt + resume")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    log = stderr_log(bench="sweep_identify")
    proto = ProtocolParams(
        nslots=args.nslots, bitsize=args.bitsize,
        max_bitsize=3 * args.bitsize, mul_width=3 * args.bitsize - 1,
        bound_match=args.nslots * 2)
    tfhe = PRESETS[args.params]

    kg, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(args.seed), 4)
    with log.timer("keygen"):
        sk, ck = jax.jit(keys.keygen, static_argnames=("params",))(
            kg, params=tfhe)
        np.asarray(ck.ks_table_limbs[0, :4])
    client = ClientDevice(7, sk, ck, proto)
    server = Server(ck, proto)

    rng = np.random.default_rng(args.seed)
    hi = (1 << args.bitsize) - 1
    templates = rng.integers(1, hi + 1, (args.n_templates, args.nslots))
    probe = templates[args.n_templates // 3] + 1   # one near-match enrolled
    clear_d = ((templates - probe) ** 2).sum(1)
    want = (clear_d > proto.bound_match).astype(int)

    # The template database is encrypted PER CHUNK inside the loop (chunk i
    # under jax.random.fold_in(k1, i), deterministic across staged runs):
    # encrypting 1024 full-width templates in one shot peaks >10 GB of
    # transient mask/limb buffers next to the resident keys and OOMs HBM
    # (observed, runs/sweep_r04_a.log).
    with log.timer("encrypt"):
        p_ct = client.encrypt_vector(k2, probe)
        bound_ct = client.encrypt_word(k3, proto.bound_match, 3 * args.bitsize)
        np.asarray(p_ct.b[..., :1])

    sw = sweep.IdentifySweep(server, args.dir, chunk=args.chunk, log=log)
    # database_id: deterministic from the generator config -- avoids the
    # 40 MB host pull and makes the fingerprint stable across processes.
    db_id = f"seed{args.seed}-n{args.n_templates}-s{args.nslots}b{args.bitsize}"
    # Bind the manifest up front with the ENGINE's fingerprint recipe so the
    # per-chunk writes below carry the same identity run()/collect() verify.
    plan = sweep.SweepPlan(
        n_templates=args.n_templates, chunk=args.chunk,
        fingerprint=sweep._fingerprint(p_ct, bound_ct, args.n_templates,
                                       args.chunk, db_id))
    prev = sw._load_manifest()
    import dataclasses as _dc
    if prev is not None and prev != _dc.asdict(plan):
        raise SystemExit(f"checkpoint dir {args.dir} holds a different sweep; "
                         "use a fresh --dir")
    sw._write_manifest(plan)

    chunk_times: "dict[str, float]" = {}
    state = {"computed_this_run": 0, "resumed": 0}
    t_start = time.time()

    def record(status):
        done = sw.completed_chunks()
        n_chunks = -(-args.n_templates // args.chunk)
        rec = {
            "metric": "identify_sweep_checkpointed",
            "status": status,
            "params": args.params,
            "n_templates": args.n_templates,
            "nslots": args.nslots, "bitsize": args.bitsize,
            "chunk": args.chunk,
            "chunks_done": len(done), "chunks_total": n_chunks,
            "templates_done": min(len(done) * args.chunk, args.n_templates),
            "computed_this_run": state["computed_this_run"],
            "resumed_from_disk": state["resumed"],
            "chunk_seconds": chunk_times,
            "seconds_this_run": round(time.time() - t_start, 1),
            "device": str(jax.devices()[0]),
            "checkpoint_dir": args.dir,
        }
        if args.out:
            atomic_json(args.out, rec)
        return rec

    # Chunk loop: IdentifySweep.run does all chunks in one call; for staged
    # interrupts and per-chunk artifact updates we drive chunk-by-chunk via
    # max-chunk-limited passes (each run() call skips finished chunks by
    # fingerprint -- that skip IS the resume bookkeeping being exercised).
    n_chunks = -(-args.n_templates // args.chunk)
    pre_done = set(sw.completed_chunks())
    state["resumed"] = len(pre_done)
    print(f"[sweep] {n_chunks} chunks of {args.chunk}; "
          f"{len(pre_done)} already on disk (resume)", flush=True)
    for i in range(n_chunks):
        if i in pre_done:
            continue
        lo = i * args.chunk
        hi_t = min(lo + args.chunk, args.n_templates)
        t0 = time.time()
        t_ct = client.encrypt_vector(jax.random.fold_in(k1, i),
                                     templates[lo:hi_t])
        out = server.identify(p_ct, t_ct, bound_ct)
        np.asarray(out.b[..., :1])  # host fetch = real barrier
        dt = time.time() - t0
        sweep._atomic_save(
            sweep._chunk_path(args.dir, i), out,
            {"chunk": i, "lo": lo, "hi": hi_t,
             "fingerprint": plan.fingerprint})
        chunk_times[str(i)] = round(dt, 1)
        state["computed_this_run"] += 1
        rate = (hi_t - lo) / dt
        print(f"[sweep] chunk {i + 1}/{n_chunks}: {dt:.0f}s "
              f"({rate:.4f} templates/s)", flush=True)
        record("running")
        if args.max_chunks and state["computed_this_run"] >= args.max_chunks:
            print(f"[sweep] stopping after {args.max_chunks} chunks "
                  "(staged interrupt); re-run to resume", flush=True)
            record("interrupted")
            return

    # Final integrity pass: collect() re-verifies EVERY chunk's fingerprint
    # against the manifest before reassembly (a stale or foreign chunk
    # raises), then the decisions are decrypted and checked end to end.
    collected = sw.collect()
    got = client.decrypt_word(collected)
    correct = float((np.asarray(got) == want).mean())
    rec = record("complete")
    rec["correct_frac"] = correct
    computed_templates = state["computed_this_run"] * args.chunk
    if chunk_times:
        rec["templates_per_s_this_run"] = round(
            computed_templates / sum(chunk_times.values()), 5)
    if args.out:
        atomic_json(args.out, rec)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
