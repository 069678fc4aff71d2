#!/bin/bash
# Round-4 TPU queue, phase 2 (replaces the tail of queue_r4_runs.sh):
# waits for the in-flight nosparse-extension orchestrator, then runs
#   2. bilinear init-fix sweep   (VERDICT r3 weak-3)
#   3. flagship_200_wide         (256-prototype capacity probe)
# Each launch is preceded by a TPU-claim probe so a lingering claim
# wedges a 2-minute probe, not a watchdog-less long run.
#
# Usage: nohup bash scripts/queue_r4_phase2.sh <ext_pid> > /tmp/queue_r4b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

EXT_PID="${1:-}"
if [ -n "$EXT_PID" ]; then
  echo "[queue2] waiting for extension orchestrator pid $EXT_PID"
  while kill -0 "$EXT_PID" 2>/dev/null; do sleep 30; done
  echo "[queue2] extension orchestrator exited"
fi
sleep 60

echo "[queue2] claim probe before bilinear sweep"
bash scripts/tpu_claim_probe.sh || exit 1

echo "[queue2] 2/3 bilinear init-fix sweep"
timeout -k 60 14400 python run_multiple_configs.py \
  --config_list configs/sweep_r4/bilinear_seeds_list.json \
  --continue_on_error
echo "[queue2] bilinear sweep rc=$?"
sleep 60

echo "[queue2] claim probe before wide run"
bash scripts/tpu_claim_probe.sh || exit 1

echo "[queue2] 3/3 flagship_200_wide (num_features=256)"
python scripts/train_chunked.py --chunk_epochs 15 --stall_timeout 900 -- \
  --config configs/flagship_200_wide.yaml
echo "[queue2] wide run rc=$?"
echo "[queue2] all done"
