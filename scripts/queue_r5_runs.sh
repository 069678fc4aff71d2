#!/bin/bash
# Round-5 TPU run queue (VERDICT r4 items 1, 2, 5). The chip is
# single-claim, so everything runs strictly sequentially:
#
#   1. flagship_200_wide: num_features 64 -> 256 capacity probe
#      (ACCURACY.md already cites analysis/flagship_200_wide — this run
#      creates the evidence; VERDICT r4 item 1).
#   2. variant sweep round5_list.json: bilinear seed 3 (both sparsity
#      variants) + linear/linear_full/identity seed 3 (share one seed-3
#      pretrain via the runner's in-process cache) + bilinear seed 1
#      under the fixed torch-parity embed init (items 1 and 5).
#   3. flagship_200_x4: the free data-scale lever — 200 train imgs/class
#      vs the 50 every committed flagship run used (item 2). The x4
#      dataset auto-regenerates via data/ensure.py before the claim.
#
# Usage: nohup bash scripts/queue_r5_runs.sh > /tmp/queue_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "[queue5] claim probe before wide"
bash scripts/tpu_claim_probe.sh || exit 1

echo "[queue5] 1/3 flagship_200_wide (num_features=256)"
python scripts/train_chunked.py --chunk_epochs 15 --stall_timeout 900 -- \
  --config configs/flagship_200_wide.yaml
echo "[queue5] wide rc=$?"
sleep 60

echo "[queue5] claim probe before sweep"
bash scripts/tpu_claim_probe.sh || exit 1

echo "[queue5] 2/3 seed-3 + bilinear-fixedinit sweep"
python run_multiple_configs.py \
  --config_list configs/sweep_r5/round5_list.json \
  --continue_on_error
echo "[queue5] sweep rc=$?"
sleep 60

echo "[queue5] claim probe before x4"
bash scripts/tpu_claim_probe.sh || exit 1

echo "[queue5] 3/3 flagship_200_x4 (200 imgs/class)"
python scripts/train_chunked.py --chunk_epochs 10 --stall_timeout 1800 -- \
  --config configs/flagship_200_x4.yaml
echo "[queue5] x4 rc=$?"
echo "[queue5] all done"
