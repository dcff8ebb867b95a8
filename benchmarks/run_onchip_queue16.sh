#!/bin/bash
# Queue 16 — round-4 measurement batch (VERDICT r3 asks #4, #5, #7):
#
#  1. attr_b128          whole-graph bucket attribution of the hybrid forward
#                        at the official batch (the 'missing 38%')
#  2. cbn_train_probe    stage-A sizing of the train-BN overhead at the up1
#                        level (decides the fused-train-up1 kernel build)
#  3. train_mem          compiled memory analysis b8..b64 (HBM-capacity
#                        evidence for the b>16 regression)
#  4. train remat=first  A/B at b16/b32/b64 vs the queue-12 curve
#
# ONE TPU process at a time; health-gated between steps.
#
#   nohup bash benchmarks/run_onchip_queue16.sh > /tmp/onchip_queue16.log 2>&1 &
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

step attr-b128 python benchmarks/attr_b128.py --batch 128 --scan-len 30
step cbn-train-probe python benchmarks/cbn_train_probe.py --batch 8 16 --scan-len 30
step train-mem python benchmarks/train_mem.py --batch 8 16 32 64
step train-remat-first-b16 python benchmarks/train_bench.py --batch 16 --bf16 --packed --remat first
step train-remat-first-b32 python benchmarks/train_bench.py --batch 32 --bf16 --packed --remat first
step train-remat-first-b64 python benchmarks/train_bench.py --batch 64 --bf16 --packed --remat first
echo "=== QUEUE16 COMPLETE $(date -u) ==="
