#!/bin/bash
# Queue 6b — the two train-remat steps queue 6 lost to a transient relay blip
# (its single-shot health probe saw the relay's between-process restart window
# and aborted; probes now retry). Same discipline: ONE TPU process at a time.
#
#   nohup bash benchmarks/run_onchip_queue6b.sh > /tmp/onchip_queue6b.log 2>&1 &
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

step train-remat-b8      python benchmarks/train_bench.py --packed --bf16 --batch 8 --remat up1,up2
step train-remat-b16     python benchmarks/train_bench.py --packed --bf16 --batch 16 --remat up1,up2
echo "=== QUEUE6B COMPLETE $(date -u) ==="
