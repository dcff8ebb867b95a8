#!/bin/bash
# Queue 8 — two train-path experiments, both decided by queue-7's split row:
#
#  1. flat-vector AdamW (optim.make_adamw_flat, commit f039587) vs the
#     per-leaf tree optimizer: train_profile's opt_ms row is the direct A/B,
#     the train_bench row the end-to-end check.
#  2. the train-side layout crossover: inference flips dense at batch >= 128;
#     the flax (dense) train step was only ever measured at batch 8 (162 vs
#     packed 195.6). If the crossover holds for training, flax at b32/b64
#     may pass the packed step.
#
# ONE TPU process at a time; retrying health probe (relay restarts between
# processes).
#
#   nohup bash benchmarks/run_onchip_queue8.sh > /tmp/onchip_queue8.log 2>&1 &
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

step train-profile-flat   python benchmarks/train_profile.py --packed --bf16 --batch 8 --flat-opt
step train-flat-b16       python benchmarks/train_bench.py --packed --bf16 --batch 16 --flat-opt
step train-flax-b32       python benchmarks/train_bench.py --bf16 --batch 32
step train-flax-b64       python benchmarks/train_bench.py --bf16 --batch 64
echo "=== QUEUE8 COMPLETE $(date -u) ==="
