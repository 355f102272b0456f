#!/bin/bash
# HISTORICAL RECORD (round 5, first pass): references merge_ab.py, deleted
# in round 5 after its hardware race — do not re-run; see tpu_queue_r05c.sh.
# Round-5 TPU work queue. The flagship quality run (scripts/quality_run.py
# --out QUALITY_r05, PID in /tmp/quality_r05.pid) owns the single-client
# device; this queue waits for it to exit, re-probes the tunnel, then runs
# the staged hardware measurements sequentially:
#   1. relayout-kernel A/B            (VMEM-cap fix in ops/pallas/relayout.py)
#   2. merge/expand-kernel A/B
#   3. packed-MXU deep-level race     (fp32-reshape fix, commit 364b5f5)
#   4. end-to-end flag sweep          (bench full_b64_bf16 under kernel combos)
#   5. RL fine-tune + constant-gain ablation on the QUALITY_r05 checkpoint
#   6. loader-fed training bench      (python ArrayLoader vs C++ NativeBatcher)
# Logs to runs/. Start in the background and leave alone.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

log() { echo "[tpu_queue_r05 $(date +%H:%M:%S)] $*"; }

# ---- 0. wait for the quality run to release the device (up to 9 h) ----
if [ -f /tmp/quality_r05.pid ]; then
  QPID=$(cat /tmp/quality_r05.pid)
  log "waiting on quality run pid $QPID"
  for i in $(seq 1 540); do
    kill -0 "$QPID" 2>/dev/null || break
    sleep 60
  done
  if kill -0 "$QPID" 2>/dev/null; then
    log "quality run still alive after 9 h; not preempting — giving up"
    exit 1
  fi
  log "quality run finished"
fi

# ---- 1. probe the tunnel (up to 2 h, every 3 min) ----
alive=0
for i in $(seq 1 40); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()) == 128.0**3
" >/dev/null 2>&1; then alive=1; break; fi
  sleep 180
done
if [ "$alive" != 1 ]; then log "tunnel dead; giving up"; exit 1; fi
log "tunnel alive"

# ---- 2. relayout A/B ----
log "relayout A/B"
timeout 2400 python scripts/relayout_ab.py 2>&1 | tee runs/relayout_ab_r05.txt

# ---- 3. merge/expand A/B ----
log "merge/expand A/B"
timeout 2400 python scripts/merge_ab.py 2>&1 | tee runs/merge_ab_r05.txt

# ---- 4. packed-MXU deep race ----
log "packed-MXU deep race"
timeout 2400 python scripts/attn_packed_ab.py 2>&1 | tee runs/attn_packed_r05.txt

# ---- 5. end-to-end flag sweep on the headline config ----
log "flag sweep (full_b64_bf16)"
{
  for combo in \
    "baseline:" \
    "relayout:SWINWNET_RELAYOUT_KERNEL=1" \
    "merge:SWINWNET_MERGE_KERNEL=1" \
    "relayout+merge:SWINWNET_RELAYOUT_KERNEL=1 SWINWNET_MERGE_KERNEL=1" \
    "packed_deep:SWINWNET_FUSED_DEEP=packed" \
    "all:SWINWNET_RELAYOUT_KERNEL=1 SWINWNET_MERGE_KERNEL=1 SWINWNET_FUSED_DEEP=packed"
  do
    name="${combo%%:*}"; flags="${combo#*:}"
    echo "=== $name ($flags) ==="
    env $flags SWINWNET_BENCH_CONFIGS=full_b64_bf16 SWINWNET_BENCH_TARGET_S=20 \
      timeout 1800 python bench.py 2>&1 | grep -E "^#|^\{" || echo "FAILED: $name"
  done
} 2>&1 | tee runs/flag_sweep_r05.txt

# ---- 6. RL fine-tune + ablation on the fresh checkpoint ----
if [ -d QUALITY_r05_ckpt ]; then
  log "RL fine-tune + constant-gain ablation"
  timeout 10800 python scripts/rl_run.py --ckpt QUALITY_r05_ckpt --out QUALITY_r05_rl \
    2>&1 | tee runs/rl_r05.log
else
  log "no QUALITY_r05_ckpt; skipping RL"
fi

# ---- 7. loader-fed training bench ----
log "loader bench (py vs native)"
SWINWNET_BENCH_CONFIGS=train_stage1_b4_loader_py,train_stage1_b4_loader_native \
  timeout 2400 python bench.py 2>&1 | tee runs/loader_bench_r05.txt

log "queue done"
