"""End-to-end sweep CLI + --finalize round-trip at toy scale (CPU).

Covers the r4->r5 evidence-pipeline fix: a sweep artifact in ANY state must
be reproducible by `sweep_identify.py --finalize` as a mechanical command --
chunk fingerprints verified against the manifest, decisions decrypted
against seed-derived plaintext expectations, rates from per-chunk metadata.
"""

import importlib.util
import json
import os

import numpy as np


def _load_cli():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "sweep_identify.py")
    spec = importlib.util.spec_from_file_location("sweep_identify_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sweep_interrupt_resume_then_finalize(tmp_path):
    si = _load_cli()
    ckpt = str(tmp_path / "ckpt")
    base = ["--params", "toy_t2", "--n-templates", "8", "--chunk", "4",
            "--nslots", "2", "--bitsize", "3", "--dir", ckpt]

    # stage 1: deliberate interrupt after one chunk
    out1 = str(tmp_path / "stage1.json")
    si.main(base + ["--out", out1, "--max-chunks", "1"])
    rec1 = json.load(open(out1))
    assert rec1["status"] == "interrupted"
    assert rec1["chunks_done"] == 1 and rec1["chunks_total"] == 2

    # finalize of the PARTIAL state: verifies + decrypts the one chunk
    outp = str(tmp_path / "partial.json")
    si.main(base + ["--out", outp, "--finalize"])
    recp = json.load(open(outp))
    assert recp["status"].startswith("partial (1/2")
    assert recp["decisions_verified"] == 4
    assert recp["correct_frac"] == 1.0
    assert recp["fingerprint_match"] == "exact"  # same platform, same draws

    # stage 2: resume to completion
    out2 = str(tmp_path / "stage2.json")
    si.main(base + ["--out", out2])
    rec2 = json.load(open(out2))
    assert rec2["status"] == "complete"
    assert rec2["resumed_from_disk"] == 1 and rec2["computed_this_run"] == 1
    assert rec2["correct_frac"] == 1.0
    assert rec2["decisions_verified"] == 8

    # finalize of the COMPLETE state reproduces the compute-path numbers
    out3 = str(tmp_path / "final.json")
    si.main(base + ["--out", out3, "--finalize"])
    rec3 = json.load(open(out3))
    assert rec3["status"] == "complete"
    assert rec3["decisions_verified"] == 8
    assert rec3["correct_frac"] == 1.0
    assert rec3["fingerprint_match"] == "exact"
    assert rec3["bootstraps_per_template"] == rec2["bootstraps_per_template"]
    # rates come from the per-chunk seconds persisted in chunk metadata
    assert rec3["timed_chunks"] == 2
    assert rec3["templates_per_s_steady"] > 0
