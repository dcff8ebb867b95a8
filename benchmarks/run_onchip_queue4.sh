#!/bin/bash
# Queue 4 — post-queue-3 measurement session (relay back 2026-08-19 ~11:00 UTC).
# Queue 3 flipped the production defaults to fused up1 + fused up2 but the
# OFFICIAL bench.py (which now exercises those defaults) was never re-run;
# queues 1/2 both died before the serving-stack A/B. This queue takes the
# headline first, then the backward per-level profile that guides the
# packed-backward kernel work, then the serving A/B. Same discipline as
# queues 1-3: ONE TPU process at a time, no timeouts, health probe after
# failures.
#
#   nohup bash benchmarks/run_onchip_queue4.sh > /tmp/onchip_queue4.log 2>&1 &
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

# 1. headline with the queue-3 production defaults (fused up1+up2) + A/B
step bench-official      python bench.py
step bench-nofused       env BENCH_FUSED=0 python bench.py
# 2. backward split per level (locates where the 6.1x bwd/fwd lives)
step bwd-profile-b8      python benchmarks/bwd_profile.py --batch 8
# 3. serving stack A/B (unmeasured since queues 1/2 died early)
step serve-live          python benchmarks/serve_bench.py --mode live
step serve-artifact      python benchmarks/serve_bench.py --mode artifact
# 4. entry compile check under the new defaults
step graft-entry         python __graft_entry__.py
echo "=== QUEUE4 COMPLETE $(date -u) ==="
