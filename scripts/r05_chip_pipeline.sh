#!/bin/bash
# Round-5 chip pipeline: runs after the 1024-template sweep (pid $1) exits.
# Stages are sequential (ONE chip; concurrent jobs corrupt timings) and each
# writes its own artifact + log. Safe to re-run; stages skip nothing but are
# idempotent producers.
cd /root/repo
SWEEP_PID=${1:?usage: r05_chip_pipeline.sh <sweep_pid>}
echo "[pipeline] waiting for sweep pid $SWEEP_PID"
while kill -0 "$SWEEP_PID" 2>/dev/null; do sleep 30; done
echo "[pipeline] sweep exited at $(date)"

# canonical finalize of the completed sweep (CPU-only; mechanical artifact)
cp SWEEP_r05.json runs/sweep_r05_run.json
timeout 1800 python scripts/sweep_identify.py --n-templates 1024 --chunk 32 \
    --dir runs/sweep_r04 --finalize \
    --merge-rates SWEEP_r04.json --merge-rates runs/sweep_r05_run.json \
    --out SWEEP_r05.json > runs/finalize_r05.log 2>&1
echo "[pipeline] finalize done $(date)"

# NTT decision constant: VPU Shoup-modmul throughput on the chip
timeout 1200 python scripts/bench_vpu_modmul.py --out NTT_DECISION_r05.json \
    > runs/ntt_modmul_r05.log 2>&1
echo "[pipeline] modmul bench done $(date)"

# N=2048 rotate miscompile repro + isolation (keygen + short bootstraps)
timeout 3000 python scripts/repro_n2048_rotate.py --out REPRO_n2048_r05.json \
    --hlo-dir runs/repro_n2048 > runs/repro_n2048_r05.log 2>&1
echo "[pipeline] repro done $(date)"

# literal BASELINE config-2 shape: 256 full-width pairs, two sub-batches
timeout 7200 python scripts/bench_matches.py --config pairs --pairs 256 \
    --split 2 --out BENCH_matches_r05.json > runs/bench_matches_r05.log 2>&1
echo "[pipeline] config-2 256-pair done $(date)"

# config-4 crypto noise campaign: >=1e7 chained gates at ring_2048_gen
# (checkpoints a valid partial artifact every ~1M gates)
timeout 10000 python scripts/diag.py campaign --params ring_2048_gen \
    --batch 8192 --steps 1280 --chunk-steps 8 --out NOISE_r05_n2048.json \
    > runs/noise_n2048_r05.log 2>&1
echo "[pipeline] n2048 campaign done $(date)"

# faithful k=1 lattice campaign (stretch; fast_genf ~8.5k bs/s -> ~21 min)
timeout 3000 python scripts/diag.py campaign --params peba1_128_fast_genf \
    --batch 8192 --steps 1280 --chunk-steps 16 --out NOISE_r05_fast.json \
    > runs/noise_fast_r05.log 2>&1
echo "[pipeline] fast_genf campaign done $(date)"

echo "[pipeline] ALL DONE $(date)"
