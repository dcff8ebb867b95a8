#!/bin/bash
# Queue 17 — headline attack knobs, driven by the queue-16 attribution:
#
#  1. fused up1 kernel tile sweep at b128 (56 = shipped, 112 = bigger tile,
#     28 = control) + gate-pass tile sweep
#  2. kernel ablations at the shipped tile (nobuild/nomask/nodma) — where do
#     the ~65% non-MXU cycles go (U-build VPU? halo DMA? masks?)
#  3. preprocess decomposition at b128 (which pass holds the ~5 ms over the
#     bandwidth floor)
#
# ONE TPU process at a time; health-gated between steps.
#
#   nohup bash benchmarks/run_onchip_queue17.sh > /tmp/onchip_queue17.log 2>&1 &
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

step fused-t56  python benchmarks/up1_bench.py --mode fused --tile 56  --batch 128
step fused-t112 python benchmarks/up1_bench.py --mode fused --tile 112 --batch 128
step fused-t28  python benchmarks/up1_bench.py --mode fused --tile 28  --batch 128
step gate-t56   python benchmarks/up1_bench.py --mode gate  --tile 56  --batch 128
step gate-t112  python benchmarks/up1_bench.py --mode gate  --tile 112 --batch 128
step abl-nobuild python benchmarks/up1_bench.py --mode fused --tile 56 --batch 128 --ablate nobuild
step abl-nomask  python benchmarks/up1_bench.py --mode fused --tile 56 --batch 128 --ablate nomask
step abl-nodma   python benchmarks/up1_bench.py --mode fused --tile 56 --batch 128 --ablate nodma
step main-t56   python benchmarks/up1_bench.py --mode main  --tile 56  --batch 128
step xla-chain  python benchmarks/up1_bench.py --mode xla   --batch 128
step pre-probe  python benchmarks/pre_probe.py --batch 128 --scan-len 30
echo "=== QUEUE17 COMPLETE $(date -u) ==="
