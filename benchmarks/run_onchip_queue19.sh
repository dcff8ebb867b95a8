#!/bin/bash
# Queue 19 — round-5 measurement sweep (VERDICT r4 asks #1/#2/#3/#4/#5/#7):
#
#  1. headline confirm on the current tree
#  2. fused_up_dense on the REAL Mosaic backend: compile probes for the
#     up2-dense / up3 / up4 geometries (compile errors are safe), then
#     execute+parity per geometry, then the whole-graph b128 A/Bs
#     (BENCH_UP2=fused_dense vs fused)
#  3. serving dispatch/fetch overlap (double-buffered dispatcher pattern)
#  4. GoogLeNet per-module attribution + merge_1x1 A/B (+ e2e A/B)
#  5. preprocess uint8-intermediate / fold-minmax probes
#  6. train backward attribution at b16 with dgrad/wgrad split
#  7. stage-2 (cls) train bench: b16/b32, f32/bf16, engine/fused ROI
#
# ONE TPU process at a time; health-gated between steps.
#
#   nohup bash benchmarks/run_onchip_queue19.sh > /tmp/onchip_queue19.log 2>&1 &
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

# --- 1. headline on the current tree (compiles all kernels + glue) ---------
step headline python bench.py

# --- 2. dense fused decoder kernels on the real Mosaic backend -------------
step updense-compile python benchmarks/up_dense_probe.py --geom all
step updense-run-up2d python benchmarks/up_dense_probe.py --geom up2d --run
step updense-run-up3  python benchmarks/up_dense_probe.py --geom up3  --run
step updense-run-up4  python benchmarks/up_dense_probe.py --geom up4  --run
step ab-up2-fused-dense env BENCH_UP2=fused_dense python bench.py
step ab-up2-fused       env BENCH_UP2=fused       python bench.py

# --- 3. serving overlap ----------------------------------------------------
step serve-overlap-live env BENCH_BATCH=128 python benchmarks/serve_bench.py \
  --mode overlap --config default
step serve-overlap-artifact env BENCH_BATCH=128 python benchmarks/serve_bench.py \
  --mode overlap-artifact --config default --static-batch 128

# --- 4. GoogLeNet attribution + merge A/B ----------------------------------
step gnet-attr python benchmarks/gnet_attr.py --batch 128 --scan-len 30 --branches
step ab-gnet-merge env BENCH_GNET_MERGE=1 python bench.py

# --- 5. preprocess probes --------------------------------------------------
step pre-probe python benchmarks/pre_probe.py --batch 128 --scan-len 30

# --- 6. train backward attribution -----------------------------------------
step bwd-b16 python benchmarks/bwd_profile.py --batch 16 --scan-len 10 --split-dw-dx

# --- 7. stage-2 train bench ------------------------------------------------
step cls-b16-bf16 python benchmarks/train_bench.py --mode cls --batch 16 --bf16 --split
step cls-b32-bf16 python benchmarks/train_bench.py --mode cls --batch 32 --bf16
step cls-b16-f32  python benchmarks/train_bench.py --mode cls --batch 16 --split
step cls-b16-bf16-fused python benchmarks/train_bench.py --mode cls --batch 16 --bf16 --fused-roi
step seg-b16-control python benchmarks/train_bench.py --batch 16 --bf16 --packed

echo "=== QUEUE19 COMPLETE $(date -u) ==="
