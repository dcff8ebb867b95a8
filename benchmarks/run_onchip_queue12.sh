#!/bin/bash
# Queue 12 — packed bf16 train batch sweep past 16.
#
#  The authoritative clean-tree train rows (queue 7/10) are 195.3 (b8) /
#  199.2 (b16) img/s — just UNDER the round-2 VERDICT's >=200 ask, while the
#  superseded queue-1-3 rows (201/206) cleared it. The b8->b16 trend
#  (+3.6 img/s from amortising the fixed glue) says b32 may clear 200 on the
#  clean tree; b64 checks whether the curve keeps rising or the activation
#  working set starts to thrash. Whatever these measure becomes the published
#  train claim (RESULTS.md "clears >=200" is amended against these rows).
#
# ONE TPU process at a time; retrying health probe (relay restarts between
# processes).
#
#   nohup bash benchmarks/run_onchip_queue12.sh > /tmp/onchip_queue12.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

health() {
  for _ in 1 2 3 4 5; do
    curl -s -m 5 http://127.0.0.1:8093/ >/dev/null 2>&1 && return 0
    sleep 30
  done
  return 1
}

step() {
  local name="$1"; shift
  if ! health; then
    echo "=== ABORT: relay down before step [$name] at $(date -u) ==="
    exit 1
  fi
  echo "=== STEP [$name] start $(date -u) ==="
  "$@"
  local rc=$?
  echo "=== STEP [$name] exit=$rc end $(date -u) ==="
  if [ $rc -ne 0 ]; then
    echo "=== step [$name] failed; probing worker health $(date -u) ==="
    if ! python -c "import jax, numpy; print(numpy.asarray(jax.numpy.ones(1) + 1))"; then
      echo "=== ABORT: worker probe failed after [$name] at $(date -u) ==="
      exit 1
    fi
    echo "=== worker healthy; continuing $(date -u) ==="
  fi
}

step train-b32-packed-bf16 python benchmarks/train_bench.py --packed --bf16 --batch 32
step train-b64-packed-bf16 python benchmarks/train_bench.py --packed --bf16 --batch 64
echo "=== QUEUE12 COMPLETE $(date -u) ==="
