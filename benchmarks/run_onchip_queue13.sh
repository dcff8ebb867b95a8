#!/bin/bash
# Queue 13 — static-batch serving artifact: ship the hybrid graph to serving.
#
#  The polymorphic artifact can only carry the packed graph (symbolic N is
#  inconclusive against the dense crossover) — 778.6 img/s at b64 (queue 9).
#  export_serving(static_batch=128, keep_fused=True) now exports the
#  measured-fastest graph (queue-9 hybrid, 1325.9 img/s scan-amortised) at
#  the production batch. Three serving rows at b128 + a parity/chunking
#  drive:
#
#  1. probe: export static hybrid on chip, serve N=130 (chunk+pad+slice),
#     grade parity vs live (calibrated: <=2% mismatch — different-batch XLA
#     programs)
#  2. live default config, b128   (per-dispatch serving baseline)
#  3. artifact default config, static 128, b128  (the new row)
#  4. artifact pure config, polymorphic, b128    (old artifact at same batch)
#
# ONE TPU process at a time; retrying health probe (relay restarts between
# processes).
#
#   nohup bash benchmarks/run_onchip_queue13.sh > /tmp/onchip_queue13.log 2>&1 &
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

step probe-static-artifact python benchmarks/probe_static_artifact.py
step serve-live-default-b128 env BENCH_BATCH=128 python benchmarks/serve_bench.py --mode live --config default
step serve-artifact-static128 env BENCH_BATCH=128 python benchmarks/serve_bench.py --mode artifact --config default --static-batch 128
step serve-artifact-poly-pure env BENCH_BATCH=128 python benchmarks/serve_bench.py --mode artifact --config pure
echo "=== QUEUE13 COMPLETE $(date -u) ==="
