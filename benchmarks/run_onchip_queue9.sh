#!/bin/bash
# Queue 9 — decompose the two open perf questions with isolated rows:
#
#  1. WHERE does the packed layout lose at batch 128? The queue-5 whole-graph
#     A/B (dense 86.26 vs packed 92.99 ms) flipped the default dense at b128,
#     but no isolated packed-level row exists at that batch. up1-level XLA vs
#     fused rows at b128 say whether the level itself inverts or the loss is
#     elsewhere (up2 tail / inc / pack boundaries).
#  2. WHERE does up1's 4.68 ms backward go? bwd_profile's up1.* sub-levels
#     (deconv / cca / splitsum / block1) split it; the dominant sub-block is
#     the Pallas-backward-twin candidate (or reveals a cheap targeted fix,
#     e.g. the mean/max pool gradient).
#
#  Plus: serve-artifact re-measure (the queue-7 crash is fixed — symbolic
#  batch now ships the packed graph) and the dense+fused-up1 HYBRID e2e at
#  the official batch 128 (BENCH_MODE=dense_fused; wins if the fused tail's
#  b128 cost beats dense up1's 30.4 ms).
#
# ONE TPU process at a time; retrying health probe (relay restarts between
# processes).
#
#   nohup bash benchmarks/run_onchip_queue9.sh > /tmp/onchip_queue9.log 2>&1 &
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

step serve-artifact  python benchmarks/serve_bench.py --mode artifact
step up1-xla-b128    python benchmarks/up1_bench.py --mode xla --batch 128
step up1-fused-b128  python benchmarks/up1_bench.py --mode fused --tile 56 --batch 128
step up2-xla-b128    python benchmarks/up1_bench.py --mode xla2 --batch 128
step bwd-up1-split   python benchmarks/bwd_profile.py --batch 8 --only up1.
step e2e-hybrid-b128 env BENCH_MODE=dense_fused python bench.py
echo "=== QUEUE9 COMPLETE $(date -u) ==="
