#!/bin/bash
# Drive the full-geometry quality matrix as short resumable invocations
# (VERDICT r4 item 1): one fresh process per group, bounded by timeout so a
# wedged remote compile (axon pathology, 45-min case observed r4) cannot eat
# the round. Rows merge into quality_modes.json; rerunning is idempotent.
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/quality_sweep.log}
: > "$LOG"
GROUPS_LIST=(
  "plain_rerun decorrelated"   # builds the ref cache + 2 calib rows
  "fp32_reference"
  "fff_pad"                    # best exact-tier leg — the headline candidate
  "dc3_pad"                    # the >=5x leg
  "dc3_fff_pad"                # 6.03x composition
  "dc3_winof_pad"
  "winof"
  "fff"
  "winof_pad"
  "chain_pad"
  "chain_fff_pad"
  "dc3_chain_pad"
  "dc3_chain_fff_pad"
  "chain16_pad"
  "chain16_fff_pad"
  "int8"
  "int8_pad"
  "pad_proj"
  "wino2"
  "dc2"
  "dc3"
  "dc3_int8"
  "dc3_wino"
  "dc3_serve"
)
for g in "${GROUPS_LIST[@]}"; do
  echo "=== $(date +%H:%M:%S) group: $g ===" >> "$LOG"
  timeout "${PER_GROUP_TIMEOUT:-2700}" python quality_modes.py $g >> "$LOG" 2>&1
  rc=$?
  echo "=== $(date +%H:%M:%S) group $g rc=$rc ===" >> "$LOG"
done
echo "=== sweep done $(date +%H:%M:%S) ===" >> "$LOG"
