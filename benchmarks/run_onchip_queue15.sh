#!/bin/bash
# Queue 15 — apps/serve.py driven on chip under concurrent load (VERDICT r3
# ask #6): p50/p95 latency + steady-state img/s vs the scan-amortised bench
# number, for the live pipeline and the exported artifact, plus the pow2
# padding bound check (<= log2(max_batch)+1 distinct device batch shapes).
#
# ONE TPU process at a time (the server subprocess); health-gated between
# steps (relay restarts between processes).
#
#   nohup bash benchmarks/run_onchip_queue15.sh > /tmp/onchip_queue15.log 2>&1 &
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

step serve-load-live python benchmarks/serve_load.py --mode live --clients 1 8 32 64 --seconds 30
step serve-load-artifact python benchmarks/serve_load.py --mode artifact --clients 1 8 32 64 --seconds 30
echo "=== QUEUE15 COMPLETE $(date -u) ==="
