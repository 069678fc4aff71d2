#!/bin/bash
# Round-4 TPU run queue: the chip is single-claim, so the flagship
# accuracy experiments run strictly sequentially. Started while the
# flagship_200_warmup chunked run is still in flight; waits for its
# orchestrator to exit first.
#
#   1. flagship_200_nosparse extension 25 -> 60 epochs (resume)
#   2. bilinear fixed-init / seed-3 sweep (VERDICT r3 weak-3)
#   3. flagship_200_wide: num_features 64 -> 256 capacity probe
#
# Usage: nohup bash scripts/queue_r4_runs.sh > /tmp/queue_r4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

WARMUP_PID="${1:-}"
if [ -n "$WARMUP_PID" ]; then
  echo "[queue] waiting for warmup orchestrator pid $WARMUP_PID"
  while kill -0 "$WARMUP_PID" 2>/dev/null; do sleep 30; done
  echo "[queue] warmup orchestrator exited"
fi
# let the TPU claim of the last chunk clear
sleep 60

echo "[queue] 1/3 nosparse extension 25->60 epochs"
python scripts/train_chunked.py --chunk_epochs 15 --stall_timeout 900 -- \
  --config configs/flagship_200_nosparse_ext.yaml --resume_training
echo "[queue] nosparse extension rc=$?"
sleep 60

echo "[queue] 2/3 bilinear init-fix sweep"
python run_multiple_configs.py \
  --config_list configs/sweep_r4/bilinear_seeds_list.json \
  --continue_on_error
echo "[queue] bilinear sweep rc=$?"
sleep 60

echo "[queue] 3/3 flagship_200_wide (num_features=256)"
python scripts/train_chunked.py --chunk_epochs 15 --stall_timeout 900 -- \
  --config configs/flagship_200_wide.yaml
echo "[queue] wide run rc=$?"
echo "[queue] all done"
