#!/bin/bash
# Queue 10 — flat-STATE training A/B + (conditional) hybrid-default re-run.
#
#  1. Flat-state training (seg.flatten_seg_state): params live as ONE raveled
#     vector for the whole run, unravelled inside the loss. Unlike queue 8's
#     --flat-opt (which LOST 14% to per-step tree<->vector copies), the
#     flat-state form has NO per-step conversion: the gradient arrives flat
#     (unravel's adjoint is one concat) and AdamW runs as a handful of
#     full-vector kernels. The A/B says whether the 169-leaf optimizer + glue
#     overhead (3.39 + 1.26 ms at b8) compresses.
#  2. Profile split of the same (fwd / bwd / opt / glue attribution).
#
# ONE TPU process at a time; retrying health probe (relay restarts between
# processes).
#
#   nohup bash benchmarks/run_onchip_queue10.sh > /tmp/onchip_queue10.log 2>&1 &
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

step train-profile-flatstate python benchmarks/train_profile.py --batch 8 --bf16 --packed --flat-state
step train-flatstate-b16     python benchmarks/train_bench.py --batch 16 --bf16 --packed --flat-state
echo "=== QUEUE10 COMPLETE $(date -u) ==="
