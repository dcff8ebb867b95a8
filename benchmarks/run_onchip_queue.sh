#!/bin/bash
# On-chip measurement queue for the axon v5e tunnel (ONCHIP_RUNBOOK.md order,
# value-first). Run as ONE background process; it launches each TPU step
# sequentially with NO enclosing timeout (a timeout kill mid-execution wedges
# the remote worker ~1h — memory/axon-tpu-tunnel-rules.md). Between steps it
# re-checks relay health and stops cleanly if the tunnel died, so a wedge
# never cascades into the remaining steps.
#
#   nohup bash benchmarks/run_onchip_queue.sh > /tmp/onchip_queue.log 2>&1 &
#
# Results are plain stdout blocks per step; publish into RESULTS.md by hand.
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
    # A failed step may mean a benign Python error (e.g. a scoped-vmem
    # compile limit — safe) OR a wedged worker. The relay stays up through a
    # wedge, so probe the worker itself with a tiny computation before
    # launching anything else: a wedge makes this hang (queue stalls safely,
    # nothing else is launched — NO timeout, a kill would deepen the wedge);
    # a clean failure lets it pass and the queue continues.
    echo "=== step [$name] failed; probing worker health $(date -u) ==="
    if ! python -c "import jax, numpy; print(numpy.asarray(jax.numpy.ones(1) + 1))"; then
      echo "=== ABORT: worker probe failed after [$name] at $(date -u) ==="
      exit 1
    fi
    echo "=== worker healthy; continuing $(date -u) ==="
  fi
}

B=benchmarks/up1_bench.py

# 0. guaranteed headline first: the measured-good packed XLA config — no new
#    kernels compile, so this lands even if a later fused step wedges.
step bench-packed        env BENCH_FUSED=0 python bench.py
# 1. v2c on-chip parity at prod shape BEFORE trusting it anywhere.
step up1-parity-prod     python $B --mode parity-prod
# 2. up1 level A/B (v2c vs XLA packed; v2b's measured best was 14.46 ms).
step up1-xla             python $B --mode xla
step up1-fused-t56       python $B --mode fused --tile 56
step up1-fused-t28       python $B --mode fused --tile 28
# 3. the other fused levels, each vs its XLA form.
step up2-xla             python $B --mode xla2
step up2-fused-t28       python $B --mode fused2 --tile 28
step up3-xla             python $B --mode xla3
step up3-fused-t28       python $B --mode fused3 --tile 28
step up4-xla             python $B --mode xla4
step up4-fused-t14       python $B --mode fused4 --tile 14
step down1-xla           python $B --mode xlad1
step down1-fused-t28     python $B --mode fusedd1 --tile 28
# 4. full fused headline + per-level and e2e profiles (incl. MXU glue A/B).
#    default bench = production defaults (fused up1 only); BENCH_FUSED=1
#    force-enables every fused level for the all-on A/B point.
step bench-fused         python bench.py
step bench-all-fused     env BENCH_FUSED=1 python bench.py
step levels-b64          python benchmarks/profile_unet_levels.py --batch 64
step e2e-b64             python benchmarks/profile_e2e.py --batches 64
# 5. training-path points beyond the published batch-8/16 rows.
step train-packed-b32    python benchmarks/train_bench.py --packed --bf16 --batch 32
step train-packed-b64    python benchmarks/train_bench.py --packed --bf16 --batch 64
# 6. serving-stack overhead: deployment artifact vs live jit at prod shape
#    (batcher mode is tunnel-bound on the dev link — skip it on chip).
step serve-live          python benchmarks/serve_bench.py --mode live
step serve-artifact      python benchmarks/serve_bench.py --mode artifact
echo "=== QUEUE COMPLETE $(date -u) ==="
