#!/bin/bash
# Wait until the remote TPU claim is actually free. A jax client started
# while a previous process's claim lingers futex-waits forever (the
# wedge scripts/train_chunked.py's watchdog handles mid-run); probing
# with a tiny bounded claim before launching a long run converts that
# hazard into a bounded retry loop at the launch boundary.
# Usage: bash scripts/tpu_claim_probe.sh [max_attempts]
set -u
cd "$(dirname "$0")/.."
MAX="${1:-20}"
for i in $(seq 1 "$MAX"); do
  if timeout -k 10 120 python -c \
      "import jax; jax.numpy.zeros(8).block_until_ready(); print('claim ok')"; then
    exit 0
  fi
  echo "[claim_probe] attempt $i/$MAX wedged or failed; cooling down 60s"
  sleep 60
done
echo "[claim_probe] giving up after $MAX attempts"
exit 1
