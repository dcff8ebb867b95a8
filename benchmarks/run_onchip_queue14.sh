#!/bin/bash
# Queue 14 — MXU-glue A/B: the last shipped-but-unmeasured defaults.
#
#  mxu_preprocess (NCHW-layout resize), mxu_roi (weight-matrix crop) and
#  s2d_stem (space-to-depth GoogLeNet stem) shipped default-on-on-TPU
#  (7e20a45, 46fee17) but only parity-tested, never timed on chip — every
#  headline since queue 6 has included them without an A/B. Three rows:
#
#  1. bench.py default            (glue ON — reconfirm today's headline)
#  2. BENCH_GLUE=0 bench.py       (glue OFF — the A/B)
#  3. profile_e2e at b128         (per-stage attribution: which of the three
#     glue paths wins/loses individually)
#
#  If glue-OFF wins, flip the TwoStagePipeline defaults (two_stage.py:175-187)
#  and re-run step 1.
#
# ONE TPU process at a time; health-gated between steps (relay restarts).
#
#   nohup bash benchmarks/run_onchip_queue14.sh > /tmp/onchip_queue14.log 2>&1 &
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

step bench-glue-on  python bench.py
step bench-glue-off env BENCH_GLUE=0 python bench.py
step profile-e2e-b128 python benchmarks/profile_e2e.py --batches 128 --scan-len 20 --iters 3
echo "=== QUEUE14 COMPLETE $(date -u) ==="
