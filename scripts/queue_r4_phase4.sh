#!/bin/bash
# Round-4 TPU queue, phase 4: after the phase-3 bilinear sweep, run the
# fresh 60-epoch-cosine nosparse flagship (configs/flagship_200_nosparse60
# rationale in the config header). Chunked + watchdog like the other
# flagship runs; the align-pretrain is hash-discovered from the original
# nosparse run so only the 60 main epochs cost TPU time.
#
# Usage: nohup bash scripts/queue_r4_phase4.sh <phase3_pid> > /tmp/queue_r4d.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

P3_PID="${1:-}"
if [ -n "$P3_PID" ]; then
  echo "[queue4] waiting for phase-3 orchestrator pid $P3_PID"
  while kill -0 "$P3_PID" 2>/dev/null; do sleep 30; done
  echo "[queue4] phase-3 orchestrator exited"
fi
sleep 60

echo "[queue4] claim probe before nosparse60"
bash scripts/tpu_claim_probe.sh || exit 1

echo "[queue4] fresh 60-epoch-cosine nosparse flagship"
python scripts/train_chunked.py --chunk_epochs 15 --stall_timeout 900 -- \
  --config configs/flagship_200_nosparse60.yaml
echo "[queue4] nosparse60 rc=$?"
echo "[queue4] all done"
