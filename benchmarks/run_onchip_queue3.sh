#!/bin/bash
# Resume of run_onchip_queue2.sh after the 2026-08-19 05:17 UTC relay cut.
# The up2/up3 fused compile failures in queue2 were stale-code races (the
# Mosaic fixes 93396bd/9843d98 landed mid-queue); every fused kernel now
# passes the CPU cross-lowering gate (tests/test_mosaic_lowering.py), so the
# A/Bs are re-queued first, with on-chip bf16 parity checks gating any
# TwoStagePipeline fused_* default flip. Same discipline as queue 1/2: ONE
# TPU process at a time, no timeouts, health probe after failures.
#
#   nohup bash benchmarks/run_onchip_queue3.sh > /tmp/onchip_queue3.log 2>&1 &
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

B=benchmarks/up1_bench.py

# 1. level A/Bs + parity gates (decide the fused_* default flips)
step up2-parity          python $B --mode parity2
step up2-fused-t28       python $B --mode fused2 --tile 28
step up3-parity          python $B --mode parity3
step up3-fused-t28       python $B --mode fused3 --tile 28
step up4-parity          python $B --mode parity4
step up4-fused-t14       python $B --mode fused4 --tile 14
step down1-parity        python $B --mode parityd1
step down1-xla           python $B --mode xlad1
step down1-fused-t28     python $B --mode fusedd1 --tile 28
# 1b. second tile point for any close call
step up2-fused-t14       python $B --mode fused2 --tile 14
step down1-fused-t56     python $B --mode fusedd1 --tile 56
# 2. up1 ablations at the best tile: locate the remaining time (45%
#    roofline) — operand builds vs masks vs input DMAs
step up1-ablate-nobuild  python $B --mode fused --tile 56 --ablate nobuild
step up1-ablate-nomask   python $B --mode fused --tile 56 --ablate nomask
step up1-ablate-nodma    python $B --mode fused --tile 56 --ablate nodma
# 3. training points + the fwd/bwd split profile (guides any backward-kernel
#    investment)
step train-packed-b32    python benchmarks/train_bench.py --packed --bf16 --batch 32
step train-packed-b64    python benchmarks/train_bench.py --packed --bf16 --batch 64
step train-profile       python benchmarks/train_profile.py --packed --bf16
echo "=== QUEUE3 COMPLETE $(date -u) ==="
