#!/bin/bash
# Queue 11 — hybrid up2 switch-point A/B at the official batch 128.
#
#  Queue 9 made the hybrid (dense trunk + packed fused up1+outc tail) the
#  default at 1325.6 img/s. The next candidate: move the dense->packed
#  switch one level earlier — dense up2 costs 19.14 ms at b128 (queue-7 map)
#  vs 15.89 for the packed-XLA up2 (queue 9, xla2). The queue-5 objection to
#  the Pallas up2 (breaks cross-level fusion with up1's deconv) no longer
#  applies: up1 is already a Pallas call in the hybrid.
#
#  1. whole-forward A/B at b128: hybrid (dense up2) vs up2="packed" vs
#     up2="fused"  (profile_unet_levels --rows-only --row-filter hybrid)
#  2. e2e at the winner's config (BENCH_UP2 env) — run both variants so the
#     table is complete either way.
#
# ONE TPU process at a time; retrying health probe (relay restarts between
# processes).
#
#   nohup bash benchmarks/run_onchip_queue11.sh > /tmp/onchip_queue11.log 2>&1 &
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

step parity-up2-variants python benchmarks/probe_up2_parity.py
step fwd-hybrid-ab-b128 python benchmarks/profile_unet_levels.py --batch 128 --rows-only --row-filter hybrid
step e2e-up2-packed     env BENCH_UP2=packed python bench.py
step e2e-up2-fused      env BENCH_UP2=fused  python bench.py
echo "=== QUEUE11 COMPLETE $(date -u) ==="
