#!/bin/bash
# HISTORICAL RECORD (round 5, second pass): references merge_ab.py, deleted
# after this queue ran — do not re-run.
# Round-5 follow-up TPU queue: the first queue (tpu_queue_r05.sh) ran the
# merge A/B and flag sweep against the PRE-rework merge/expand kernels
# (Mosaic shape-cast failure, runs/merge_ab_r05.txt) and lost the device
# grant before the loader bench. This queue re-runs exactly the missing
# measurements against the reworked (strided-slice) kernels:
#   1. merge/expand/LN standalone A/B      (scripts/merge_ab.py, resilient)
#   2. in-situ merge-kernel flag check     (bench full_b64_bf16)
#   3. loader-fed training bench           (python ArrayLoader vs NativeBatcher)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

log() { echo "[tpu_queue_r05b $(date +%H:%M:%S)] $*"; }

# ---- 0. probe the tunnel (up to 3 h, every 3 min) ----
alive=0
for i in $(seq 1 60); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()) == 128.0**3
" >/dev/null 2>&1; then alive=1; break; fi
  sleep 180
done
if [ "$alive" != 1 ]; then log "tunnel dead after 3 h; giving up"; exit 1; fi
log "tunnel alive"

# ---- 1. merge/expand/LN standalone A/B (reworked kernels) ----
log "merge/expand A/B (reworked kernels)"
timeout 2400 python scripts/merge_ab.py 2>&1 | tee runs/merge_ab_r05b.txt

# ---- 2. in-situ flag check on the headline config ----
# (the r05 sweep's non-baseline rows crashed with stderr filtered out —
#  keep full tails here so a Mosaic/compile failure is visible in the log)
log "flag check (full_b64_bf16: baseline vs merge kernel vs packed deep)"
{
  for combo in "baseline:" "merge:SWINWNET_MERGE_KERNEL=1" "packed_deep:SWINWNET_FUSED_DEEP=packed"; do
    name="${combo%%:*}"; flags="${combo#*:}"
    echo "=== $name ($flags) ==="
    env $flags SWINWNET_BENCH_CONFIGS=full_b64_bf16 SWINWNET_BENCH_TARGET_S=20 \
      timeout 1800 python bench.py 2>&1 | tail -20
  done
} 2>&1 | tee runs/flag_sweep_r05b.txt

# ---- 3. loader-fed training bench ----
log "loader bench (py vs native)"
SWINWNET_BENCH_CONFIGS=train_stage1_b4_loader_py,train_stage1_b4_loader_native \
  timeout 2400 python bench.py 2>&1 | tee runs/loader_bench_r05b.txt

log "queue done"
