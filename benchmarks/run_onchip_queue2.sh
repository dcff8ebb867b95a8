#!/bin/bash
# Resume of run_onchip_queue.sh after the 2026-08-19 04:46 UTC relay cut —
# picks up at the first unmeasured step. Same discipline: ONE TPU process at
# a time, no timeouts, health probe after failures (see run_onchip_queue.sh).
#
#   nohup bash benchmarks/run_onchip_queue2.sh > /tmp/onchip_queue2.log 2>&1 &
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

# 1. re-measure fused up2 (dense-block1 kernel + XLA pack epilogue — the
#    in-kernel repack was a Mosaic-unsupported lane-merging cast)
step up2-fused-t28       python $B --mode fused2 --tile 28
# 2. remaining level A/Bs
step up3-fused-t28       python $B --mode fused3 --tile 28
step up4-xla             python $B --mode xla4
step up4-fused-t14       python $B --mode fused4 --tile 14
step down1-xla           python $B --mode xlad1
step down1-fused-t28     python $B --mode fusedd1 --tile 28
# 2b. up1 ablations at the best tile: locate the remaining time (45%
#     roofline) — operand builds vs masks vs input DMAs
step up1-ablate-nobuild  python $B --mode fused --tile 56 --ablate nobuild
step up1-ablate-nomask   python $B --mode fused --tile 56 --ablate nomask
step up1-ablate-nodma    python $B --mode fused --tile 56 --ablate nodma
# 3. headline: production defaults (fused up1 only), then all-fused A/B
step bench-fused         python bench.py
step bench-all-fused     env BENCH_FUSED=1 python bench.py
# 4. profiles
step levels-b64          python benchmarks/profile_unet_levels.py --batch 64
step e2e-b64             python benchmarks/profile_e2e.py --batches 64
# 5. training points + the fwd/bwd split profile (guides any backward-kernel
#    investment)
step train-packed-b32    python benchmarks/train_bench.py --packed --bf16 --batch 32
step train-packed-b64    python benchmarks/train_bench.py --packed --bf16 --batch 64
step train-profile       python benchmarks/train_profile.py --packed --bf16
# 6. serving stack
step serve-live          python benchmarks/serve_bench.py --mode live
step serve-artifact      python benchmarks/serve_bench.py --mode artifact
echo "=== QUEUE2 COMPLETE $(date -u) ==="
