#!/bin/bash
# Dynamic TPU work queue: waits for the tunnel, then runs job files from
# runs/queue/ in lexical order (single-client device — strictly one at a
# time). New jobs can be appended to runs/queue/ while the queue runs;
# completed jobs move to runs/queue/done/, failed ones to runs/queue/failed/.
# The queue exits when runs/queue/ is empty AND runs/queue/STOP exists, or
# after the probe window expires with the tunnel never coming up.
#
#   bash scripts/tpu_queue.sh &          # arm
#   cat > runs/queue/30_myjob.sh <<EOF   # append a job (plain bash, cwd=repo)
#   timeout 1800 python scripts/foo.py 2>&1 | tee runs/foo.log
#   EOF
#   touch runs/queue/STOP                # drain-and-exit
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/queue/done runs/queue/failed

log() { echo "[tpu_queue $(date +%H:%M:%S)] $*"; }

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()) == 128.0**3
" >/dev/null 2>&1
}

# ---- wait for the tunnel (up to 8 h, probe every 3 min) ----
alive=0
for i in $(seq 1 160); do
  if probe; then alive=1; break; fi
  log "probe $i: tunnel down"
  sleep 180
done
if [ "$alive" != 1 ]; then log "tunnel never came back; giving up"; exit 1; fi
log "tunnel alive after $i probe(s)"

# ---- drain the job directory ----
idle=0
while true; do
  job=$(ls runs/queue/*.sh 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    if [ -e runs/queue/STOP ]; then log "queue empty + STOP; exiting"; break; fi
    idle=$((idle + 1))
    if [ "$idle" -ge 60 ]; then log "queue idle 60 min; exiting"; break; fi
    sleep 60
    continue
  fi
  idle=0
  name=$(basename "$job")
  # re-probe before each job so a mid-queue outage fails the job, not the queue
  if ! probe; then
    log "tunnel died before $name; waiting for it to return"
    back=0
    for i in $(seq 1 160); do
      if probe; then back=1; break; fi
      sleep 180
    done
    if [ "$back" != 1 ]; then log "tunnel gone for 8 h mid-queue; giving up"; exit 1; fi
  fi
  log "running $name"
  if bash "$job" >> "runs/queue/${name%.sh}.log" 2>&1; then
    log "$name done"
    mv "$job" runs/queue/done/
  else
    log "$name FAILED (rc=$?)"
    mv "$job" runs/queue/failed/
  fi
done
log "queue done"
