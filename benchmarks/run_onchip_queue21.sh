#!/bin/bash
# Queue 21 — round-5 close-out: official headline confirm on the final tree
# + BASELINE config sweep refresh (tracking rows).
#
#   nohup bash benchmarks/run_onchip_queue21.sh > /tmp/onchip_queue21.log 2>&1 &
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
    if ! timeout 300 python -c "import jax, numpy; print(numpy.asarray(jax.numpy.ones(1) + 1))"; then
      echo "=== ABORT: worker probe failed after [$name] at $(date -u) ==="
      exit 1
    fi
    echo "=== worker healthy; continuing $(date -u) ==="
  fi
}

step cls-b128-bf16 python benchmarks/train_bench.py --mode cls --batch 128 --bf16
step headline-final python bench.py
step baseline-sweep python benchmarks/configs.py
step entry-check python __graft_entry__.py

echo "=== QUEUE21 COMPLETE $(date -u) ==="
