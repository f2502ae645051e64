"""Merge partial lever-matrix JSONs (one per diag throughput invocation;
the matrix is run in several processes to bound HBM accumulation and use
per-family chain lengths) into one LEVER artifact, newest row per config."""

import argparse
import json
import sys

from collections import OrderedDict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    rows = OrderedDict()
    meta = {}
    for path in args.inputs:
        try:
            with open(path) as f:
                d = json.load(f)
        except FileNotFoundError:
            print(f"skip missing {path}", file=sys.stderr)
            continue
        for r in d.get("rows", []):
            r = dict(r, batch=d.get("batch"),
                     chain_lengths=d.get("chain_lengths"),
                     reps=d.get("reps"))
            rows[r["config"]] = r   # later files win
        meta.setdefault("device", d.get("device"))
    out = {
        "metric": "throughput_lever_matrix",
        "rows": list(rows.values()),
        "device": meta.get("device"),
        "sources": args.inputs,
    }
    with open(args.out + ".tmp", "w") as f:
        json.dump(out, f, indent=1)
    import os
    os.replace(args.out + ".tmp", args.out)
    print(f"{len(rows)} configs -> {args.out}")


if __name__ == "__main__":
    main()
