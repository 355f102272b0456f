#!/bin/bash
# Round-5 final measurement pass: the r05b flag check lost its non-baseline
# rows to the single-client grant wedge (a just-exited bench process holds
# the device for minutes; bench.py's 240 s preflight gives up first).
# Probe patiently before each step:
#   1. in-situ LN-kernel row   (SWINWNET_MERGE_KERNEL=1 now gates LN only
#                               on hardware — merge/expand are Mosaic-illegal)
#   2. loader-fed training bench (python ArrayLoader vs C++ NativeBatcher)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

log() { echo "[tpu_queue_r05c $(date +%H:%M:%S)] $*"; }

wait_device() {
  for i in $(seq 1 30); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()) == 128.0**3
" >/dev/null 2>&1; then return 0; fi
    sleep 120
  done
  return 1
}

log "waiting for device (step 1)"
wait_device || { log "device dead; giving up"; exit 1; }
log "in-situ LN-kernel row"
SWINWNET_MERGE_KERNEL=1 SWINWNET_BENCH_CONFIGS=full_b64_bf16 SWINWNET_BENCH_TARGET_S=20 \
  timeout 1800 python bench.py 2>&1 | tee runs/ln_insitu_r05.txt

log "waiting for device (step 2)"
wait_device || { log "device dead; giving up"; exit 1; }
log "loader bench (py vs native)"
SWINWNET_BENCH_CONFIGS=train_stage1_b4_loader_py,train_stage1_b4_loader_native \
  timeout 2400 python bench.py 2>&1 | tee runs/loader_bench_r05c.txt

log "queue done"
