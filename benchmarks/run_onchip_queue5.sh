#!/bin/bash
# Queue 5 — follow-ups to queue 4's headline finding.
#
# Queue 4 measured the official bench (batch 128) at 1188 img/s with the
# fused up1+up2 defaults ON vs 1235 with them OFF — the level A/Bs that
# justified the default flip were batch-64 measurements. This queue locates
# the batch dependence (batch-64 e2e both modes, batch-192 fused) and
# re-measures the training points with the new elementwise-mask maxpool
# backward (commit 7f6185f). Same discipline: ONE TPU process at a time, no
# timeouts, health probe after failures.
#
#   nohup bash benchmarks/run_onchip_queue5.sh > /tmp/onchip_queue5.log 2>&1 &
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

# 1. locate the fused-vs-batch crossover on the e2e headline
step bench-b64-fused     env BENCH_BATCH=64 python bench.py
step bench-b64-nofused   env BENCH_BATCH=64 BENCH_FUSED=0 python bench.py
step bench-b192-fused    env BENCH_BATCH=192 python bench.py
# 1b. whole-forward rows incl. the prod-default fused set, to locate where
#     the batch-128 e2e regression lives (kernel scaling vs lost cross-level
#     XLA fusion vs non-UNet stages)
step fwd-profile-b128    python benchmarks/profile_unet_levels.py --batch 128 --scan-len 20
step fwd-profile-b64     python benchmarks/profile_unet_levels.py --batch 64
# 2. training points with the fast maxpool backward (A/B vs queue-3 rows:
#    packed b8 39.8 ms / b16 77.6 ms; flax bf16 b8 48.5 ms)
step train-packed-b8     python benchmarks/train_bench.py --packed --bf16 --batch 8
step train-packed-b16    python benchmarks/train_bench.py --packed --bf16 --batch 16
step train-flax-b8       python benchmarks/train_bench.py --bf16 --batch 8
step train-profile       python benchmarks/train_profile.py --packed --bf16
echo "=== QUEUE5 COMPLETE $(date -u) ==="
