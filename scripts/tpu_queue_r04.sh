#!/bin/bash
# HISTORICAL RECORD (round 4): references A/B scripts deleted in round 5
# (relayout_ab.py, merge_ab.py) after their hardware races — do not re-run.
# Round-4 TPU work queue: waits for the tunnel, then runs the staged TPU
# jobs sequentially (single-client device — strictly one at a time):
#   1. relayout-kernel hardware A/B            (~10 min)
#   2. quality run: bf16 + refined calibration + SSIM-aware SR loss (~1-2 h)
#   3. RL fine-tune + constant-gain ablation    (~30 min)
#   4. bench.py full suite                      (~15 min)
# Logs to runs/. Designed to be started in the background and left alone.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

log() { echo "[tpu_queue $(date +%H:%M:%S)] $*"; }

# ---- 1. wait for the tunnel (up to 8 h, probe every 3 min) ----
alive=0
for i in $(seq 1 160); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()) == 128.0**3
" >/dev/null 2>&1; then alive=1; break; fi
  sleep 180
done
if [ "$alive" != 1 ]; then log "tunnel never came back; giving up"; exit 1; fi
log "tunnel alive after $i probes"

# ---- 2. relayout A/B ----
log "relayout A/B"
timeout 1800 python scripts/relayout_ab.py 2>&1 | tee runs/relayout_ab_r04.txt

# ---- 3. quality run ----
log "quality run (bf16, refined calibration, SmoothL1SSIMLoss)"
timeout 14400 python scripts/quality_run.py \
  --out QUALITY_r04 \
  --train-crystals 64 --renders-per-crystal 6 --eval-renders-per-crystal 8 \
  --seg-epochs 40 --sr-epochs 60 --full-epochs 80 --warmup-epochs 3 \
  --noise-passes 5 --compute-dtype bf16 --sr-loss SmoothL1SSIMLoss \
  2>&1 | tee runs/quality_r04.log

# ---- 4. RL fine-tune + ablation ----
if [ -d QUALITY_r04_ckpt ]; then
  log "RL fine-tune + constant-gain ablation"
  timeout 7200 python scripts/rl_run.py --ckpt QUALITY_r04_ckpt --out QUALITY_r04_rl \
    2>&1 | tee runs/rl_r04.log
fi

# ---- 5. bench ----
log "bench suite"
timeout 3600 python bench.py 2>&1 | tee runs/BENCH_local_r04.txt
log "queue done"
