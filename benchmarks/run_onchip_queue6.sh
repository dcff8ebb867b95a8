#!/bin/bash
# Queue 6 — decide the production layout policy from e2e numbers.
#
# Queue 5's whole-forward profile (batch 128 bf16) put the plain DENSE engine
# forward at 86.26 ms vs packed 92.99 / packed+fused-up1+up2 96.42 — the
# packed/fused win is batch-dependent (it holds at 64, inverts by 128). This
# queue measures the e2e headline with the dense forward at the large batches
# (BENCH_MODE=dense, bench.py), plus the training remat rows. The winner sets
# TwoStagePipeline's dense_batch_min default and the official bench config.
# Same discipline: ONE TPU process at a time, no timeouts, health probe after
# failures.
#
#   nohup bash benchmarks/run_onchip_queue6.sh > /tmp/onchip_queue6.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

health() { curl -s -m 5 http://127.0.0.1:8093/ >/dev/null 2>&1; }

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

# 1. e2e with the dense engine forward at the large-batch points
step bench-b128-dense    env BENCH_MODE=dense python bench.py
step bench-b192-dense    env BENCH_BATCH=192 BENCH_MODE=dense python bench.py
step bench-b256-dense    env BENCH_BATCH=256 BENCH_MODE=dense python bench.py
# 2. training: remat of the HBM-bound big levels (A/B vs queue-5 rows)
step train-remat-b8      python benchmarks/train_bench.py --packed --bf16 --batch 8 --remat up1,up2
step train-remat-b16     python benchmarks/train_bench.py --packed --bf16 --batch 16 --remat up1,up2
echo "=== QUEUE6 COMPLETE $(date -u) ==="
