#!/bin/bash
# Queue 20 — round-5 second sweep, driven by queue 19's findings:
#
#  1. headline with the shipped u8-intermediate preprocess (expect ~+10 img/s)
#     + fast_resize composition
#  2. dense fused decoder kernels AFTER the sublane-alignment fix: compile +
#     run + parity at up3/up4, level-scale A/Bs, then the whole-graph
#     BENCH_UP34=1 A/B at b128
#  3. train: dense-up1 tail A/B at b16/b8 (the backward-attribution lever),
#     down1-dx diagnosis micro-levels, dense-up1 level row
#  4. any queue-19 cls stragglers re-run if needed
#
#   nohup bash benchmarks/run_onchip_queue20.sh > /tmp/onchip_queue20.log 2>&1 &
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

# --- 1. new headline (u8 preprocess shipped) -------------------------------
step headline-u8 python bench.py
step headline-u8-fast env BENCH_FAST_RESIZE=1 python bench.py

# --- 2. dense fused kernels after the alignment fix ------------------------
step updense2-compile python benchmarks/up_dense_probe.py --geom all
step updense2-run-up3 python benchmarks/up_dense_probe.py --geom up3 --run
step updense2-run-up4 python benchmarks/up_dense_probe.py --geom up4 --run
step ab-up34 env BENCH_UP34=1 python bench.py

# --- 3. train A/Bs ----------------------------------------------------------
step train-dense-up1-b16 python benchmarks/train_bench.py --batch 16 --bf16 --dense-up1
step train-dense-up1-b8  python benchmarks/train_bench.py --batch 8 --bf16 --dense-up1
step bwd-micro python benchmarks/bwd_profile.py --batch 16 --scan-len 10 \
  --only "down1." --split-dw-dx
step bwd-up1-dense python benchmarks/bwd_profile.py --batch 16 --scan-len 10 \
  --only "up1 DENSE" --split-dw-dx

# --- 4. cls curve extension (b32 beat b16: 717.9 vs 677.6) -----------------
step cls-b64-bf16 python benchmarks/train_bench.py --mode cls --batch 64 --bf16
step cls-b32-bf16-split python benchmarks/train_bench.py --mode cls --batch 32 --bf16 --split

echo "=== QUEUE20 COMPLETE $(date -u) ==="
