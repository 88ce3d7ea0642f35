#!/bin/bash
# Quality-matrix driver, v2 (supersedes quality_sweep.sh): between groups,
# probe the tunnel with a trivial jit under a short timeout — if the probe
# stalls, the remote-compile service is wedged (axon pathology: killed
# clients do NOT cancel server-side compiles; piling jobs on a wedged
# service cascades 45-min timeouts) — wait and re-probe instead of
# launching the next heavy job. Rows merge into quality_modes.json, so
# re-running this script resumes wherever the last run died.
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/quality_sweep.log}
probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((1024, 1024), jnp.bfloat16))
print('probe-ok', float(x))" >> "$LOG" 2>&1
}
wait_healthy() {
  for i in $(seq 1 20); do
    if probe; then return 0; fi
    echo "=== $(date +%H:%M:%S) tunnel wedged (probe $i) — waiting 120s ===" >> "$LOG"
    sleep 120
  done
  return 1
}
for g in "$@"; do
  echo "=== $(date +%H:%M:%S) probe before group: $g ===" >> "$LOG"
  wait_healthy || { echo "=== tunnel never recovered — stopping ===" >> "$LOG"; exit 1; }
  echo "=== $(date +%H:%M:%S) group: $g ===" >> "$LOG"
  timeout "${PER_GROUP_TIMEOUT:-2700}" python quality_modes.py $g >> "$LOG" 2>&1
  echo "=== $(date +%H:%M:%S) group $g rc=$? ===" >> "$LOG"
done
echo "=== sweep done $(date +%H:%M:%S) ===" >> "$LOG"
