"""Measure achieved Shoup-modmul throughput on the VPU (docs/NTT_DECISION.md).

The NTT-vs-GEMM decision reduces to one hardware ratio: exact int8 MACs/s on
the MXU (measured ~1.6e14 via the bootstrap roofline, BENCH/LEVER artifacts)
vs exact modular multiplies/s on the VPU -- every butterfly and pointwise
product of an exact integer NTT is a Shoup modmul (ops/ntt._mulmod_shoup:
~6 uint32 lowmuls + ~12 adds/shifts/selects, because the VPU has no widening
multiply).  This script measures the latter directly: a jitted chain of K
dependent modmul sweeps over an E-element uint32 array, timed with the
relay-honest two-chain-lengths delta (same discipline as scripts/diag.py:
the axon relay's async dispatch + result caching make single timings lies).

  python scripts/bench_vpu_modmul.py            # on the chip
  python scripts/bench_vpu_modmul.py --platform cpu   # harness check

Emits one JSON line: measured modmuls/s and the derived NTT projections for
the shipped parameter sets (the same formulas as docs/NTT_DECISION.md).
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
import jax.numpy as jnp
import numpy as np

from peba1_tpu.ops import ntt


def make_chain(reps: int):
    wv = np.uint32(123456791 % ntt.P)
    ws = np.uint32((int(wv) << 32) // ntt.P)

    @jax.jit
    def chain(x):
        def body(i, x):
            # dependent chain: each sweep reads the previous result; the
            # twiddle is a compile-time constant like real stage twiddles.
            return ntt._mulmod_shoup(x, jnp.uint32(wv), jnp.uint32(ws))
        return jax.lax.fori_loop(0, reps, body, x)

    return chain


def timed(chain, x):
    out = chain(x)
    np.asarray(out[:8])  # host fetch = the only real barrier on the relay
    t0 = time.time()
    out = chain(x)
    np.asarray(out[:8])
    return time.time() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    # Scale: the relay's dispatch/fetch jitter is 0.1-0.9 s, so the LONG
    # chain must be several seconds of pure device time (the r5 first
    # attempt at 64 sweeps x 2^24 elems was ~10 ms of work and measured
    # relay noise, including a negative delta).  At the plausible 1e11
    # modmul/s these defaults give ~0.9 s vs ~7 s.
    ap.add_argument("--elems", type=int, default=1 << 22)
    ap.add_argument("--short", type=int, default=32768)
    ap.add_argument("--long", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    rng = np.random.default_rng(0)
    deltas = []
    for r in range(args.reps):
        x = jnp.asarray(
            rng.integers(0, ntt.P, args.elems, dtype=np.int64).astype(np.uint32))
        cs, cl = make_chain(args.short), make_chain(args.long)
        ts = timed(cs, x)
        tl = timed(cl, x)
        deltas.append((tl - ts) / (args.long - args.short))
        print(f"[rep {r}] short({args.short})={ts:.3f}s long({args.long})="
              f"{tl:.3f}s -> {args.elems / deltas[-1] / 1e9:.2f} G modmul/s",
              flush=True)
    pos = [d for d in deltas if d > 0]
    if not pos:
        raise SystemExit("all long-short deltas non-positive (relay noise "
                         "floor); increase --long/--elems, artifact NOT "
                         "written")
    per_sweep = min(pos)
    if per_sweep * (args.long - args.short) < 1.0:
        print("[warn] long-short delta under 1 s -- relay noise floor; "
              "increase --long/--elems", file=sys.stderr, flush=True)
    rate = args.elems / per_sweep

    # NTT projections (docs/NTT_DECISION.md formulas): modmuls per bootstrap
    # = n * ((G + C) * (N/2) * log2 N  +  G * C * N)   [limb-split variant]
    def proj(n, G, C, N):
        per_step = (G + C) * (N // 2) * (N.bit_length() - 1) + G * C * N
        return n * per_step

    sets = {
        "t2": {"modmuls": proj(630, 6, 11, 512), "measured_gemm_bs": 13660},
        "fast": {"modmuls": proj(630, 4, 7, 1024), "measured_gemm_bs": 8469},
        "n2048": {"modmuls": proj(1024, 4, 7, 2048), "measured_gemm_bs": 1358},
    }
    for s in sets.values():
        s["projected_ntt_bs"] = round(rate / s["modmuls"], 1)
        s["ntt_vs_gemm"] = round(s["projected_ntt_bs"] / s["measured_gemm_bs"], 3)

    rec = {
        "metric": "vpu_shoup_modmul_throughput",
        "value": round(rate / 1e9, 3),
        "unit": "G modmul/s",
        "elems": args.elems,
        "chain_lengths": [args.short, args.long],
        "reps": args.reps,
        "device": str(jax.devices()[0]),
        "ntt_projections": sets,
    }
    print(json.dumps(rec))
    if args.out:
        from peba1_tpu.utils.artifacts import atomic_json
        atomic_json(args.out, rec)


if __name__ == "__main__":
    main()
