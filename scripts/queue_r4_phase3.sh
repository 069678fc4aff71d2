#!/bin/bash
# Round-4 TPU queue, phase 3: the bilinear init-fix sweep from phase 2
# failed instantly because data/geometric_shapes_no_noise was not on
# disk (data/ is gitignored; the round-3 generation did not survive the
# session boundary). The datasets have been regenerated; this phase
# waits for the phase-2 orchestrator (the flagship_200_wide run), then
# re-runs the sweep.
#
# Usage: nohup bash scripts/queue_r4_phase3.sh <phase2_pid> > /tmp/queue_r4c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

P2_PID="${1:-}"
if [ -n "$P2_PID" ]; then
  echo "[queue3] waiting for phase-2 orchestrator pid $P2_PID"
  while kill -0 "$P2_PID" 2>/dev/null; do sleep 30; done
  echo "[queue3] phase-2 orchestrator exited"
fi
sleep 60

echo "[queue3] claim probe before bilinear sweep"
bash scripts/tpu_claim_probe.sh || exit 1

echo "[queue3] bilinear init-fix sweep (retry with regenerated data)"
timeout -k 60 14400 python run_multiple_configs.py \
  --config_list configs/sweep_r4/bilinear_seeds_list.json \
  --continue_on_error
echo "[queue3] bilinear sweep rc=$?"
echo "[queue3] all done"
