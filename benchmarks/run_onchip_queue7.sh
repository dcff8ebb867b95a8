#!/bin/bash
# Queue 7 — close the open measurement threads after the queue-6 policy call.
#
#  1. train-profile with the new optimizer/glue split (what is the 10 ms
#     non-fwd-bwd in the queue-5 row made of?), on a CLEAN committed tree —
#     queue 5's train rows ran against a mid-edit working tree.
#  2. serving artifact re-measure: queue 4 found Exported.call re-tracing per
#     invocation (38x); pipeline/export.py now jits once at load — confirm
#     the artifact is ~live-cost.
#  3. fwd-profile re-runs: the whole-forward rows are crash-isolated since
#     c0b044f, so the b128/b64 tables complete (the known-failing all-fused
#     row prints n/a instead of killing the step).
#
# Same discipline: ONE TPU process at a time, no timeouts, health probe after
# failures.
#
#   nohup bash benchmarks/run_onchip_queue7.sh > /tmp/onchip_queue7.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

# the relay drops for a few seconds between processes (seen 13:48 and 15:28
# UTC 08-19, both immediately after a step exited) — retry before aborting
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

step train-profile-split  python benchmarks/train_profile.py --packed --bf16 --batch 8
step serve-live           python benchmarks/serve_bench.py --mode live
step serve-artifact       python benchmarks/serve_bench.py --mode artifact
step fwd-profile-b128     python benchmarks/profile_unet_levels.py --batch 128 --scan-len 20
step fwd-profile-b64      python benchmarks/profile_unet_levels.py --batch 64 --scan-len 50
echo "=== QUEUE7 COMPLETE $(date -u) ==="
