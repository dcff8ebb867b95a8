"""Serving-stack overhead benchmark: exported artifact vs live jit.

The deployment artifact (pipeline/export.py) runs the SAME pure-XLA grades
graph as the live pipeline, deserialized from StableHLO instead of traced
from Python. This harness measures what the artifact costs (or doesn't) at
the production shape, one short measurement per invocation (tunnel-safe, see
benchmarks/ONCHIP_RUNBOOK.md):

    python benchmarks/serve_bench.py --mode live       # jit(pipe._grades)
    python benchmarks/serve_bench.py --mode artifact   # exported.call
    python benchmarks/serve_bench.py --mode batcher    # + MicroBatcher (host)

--config pure (default) builds BOTH sides pure-XLA so live-vs-artifact
isolates the serialization path. --config default builds the pipeline's
production defaults (on TPU: the hybrid dense trunk + Pallas fused-up1 tail
at batches >= 128) — combine with --static-batch to export the
measured-fastest graph at a fixed production batch (a polymorphic export
can only ship the packed graph; pipeline/export.py static_batch docs).

live/artifact time repeated device calls on a device-resident input batch and
fetch only the (N,) grades (tunnel ~1 MB/s: the input must never cross the
link inside the timed region). batcher measures the host-side dispatcher
overhead of pipeline/serving.MicroBatcher on top of the artifact (threading +
stack/pad, no HTTP) — on CPU backends this is the interesting number; on the
chip it shows whether micro-batching hides inside the device call.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
SIZE = int(os.environ.get("BENCH_SIZE", "224"))          # model input
_raw = os.environ.get("BENCH_RAW_HW", "400x500")          # raw gray input
IMG_HW = tuple(int(v) for v in _raw.split("x"))
REPS = 5


def build(dtype_name: str, config: str):
    import jax
    import jax.numpy as jnp

    from unet_goolenet_tpu.models import (GoogLeNetClassifier,
                                          UNetTaskAligWeight)
    from unet_goolenet_tpu.pipeline import TwoStagePipeline

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    unet = UNetTaskAligWeight(n_classes=1, dtype=dtype)
    gnet = GoogLeNetClassifier(num_classes=6, dtype=dtype)
    uv = unet.init({"params": key}, jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    gv = gnet.init({"params": key, "dropout": key},
                   jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    if config == "pure":
        # pure-XLA config on BOTH sides so live-vs-artifact isolates the
        # serialization path, not the Pallas kernels (which exports exclude)
        kw = dict(fused_up1=False, fused_up2=False, fused_up34=False,
                  fused_down1=False, dense_fused_up1=False)
    else:  # the pipeline's measured production defaults (hybrid on TPU)
        kw = {}
    pipe = TwoStagePipeline(unet, uv, gnet, gv, img_size=SIZE, dtype=dtype,
                            **kw)
    gray = jax.random.uniform(key, (BATCH, *IMG_HW), jnp.float32, 0.0, 255.0)
    return pipe, jax.device_put(gray)


def timeit(fn) -> float:
    _ = np.asarray(fn())          # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = np.asarray(fn())    # fetch (N,) grades: forces execution, tiny
        best = min(best, time.perf_counter() - t0)
    assert out.shape[0] == BATCH
    return best


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["live", "artifact", "batcher",
                                      "overlap", "overlap-artifact"],
                   required=True)
    p.add_argument("--stream-len", type=int, default=8,
                   help="overlap modes: distinct device-resident batches "
                        "per timed stream pass")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--config", choices=["pure", "default"], default="pure")
    p.add_argument("--static-batch", type=int, default=0,
                   help="export at this fixed batch instead of symbolic N "
                        "(0 = polymorphic). Required to ship the dense "
                        "hybrid graph into the artifact.")
    args = p.parse_args()

    pipe, gray = build(args.dtype, args.config)

    if args.mode in ("overlap", "overlap-artifact"):
        # Per-dispatch serving with the double-buffered dispatcher pattern
        # (pipeline/serving.MicroBatcher overlap=True, VERDICT r4 ask #4):
        # dispatch batch k+1 BEFORE fetching batch k's grades, so the chip
        # never idles for the fetch RTT + host glue between batches. Streams
        # of distinct device-resident batches (the dev tunnel's ~1 MB/s
        # uplink would otherwise dominate; a real server's images arrive on
        # a fast NIC), grades fetched per batch like a server does.
        import jax
        import jax.numpy as jnp

        if args.mode == "overlap-artifact":
            from unet_goolenet_tpu.pipeline.export import (export_serving,
                                                           load_serving)
            d = tempfile.mkdtemp()
            export_serving(pipe, d, raw_hw=IMG_HW,
                           static_batch=args.static_batch or None,
                           keep_fused=args.config == "default")
            runner = load_serving(d)
            fn = runner
        else:
            fn = lambda g: pipe.infer_grades(g)  # noqa: E731

        key = jax.random.PRNGKey(1)
        batches = [jax.device_put(jax.random.uniform(
            jax.random.fold_in(key, i), (BATCH, *IMG_HW), jnp.float32,
            0.0, 255.0)) for i in range(args.stream_len)]

        def run_sync():
            outs = []
            for g in batches:
                outs.append(np.asarray(fn(g)))       # fetch before next dispatch
            return outs

        def run_overlap():
            outs, prev = [], None
            for g in batches:
                cur = fn(g)                          # async dispatch
                if prev is not None:
                    outs.append(np.asarray(prev))    # fetch k while k+1 runs
                prev = cur
            outs.append(np.asarray(prev))
            return outs

        for name, run in (("sync", run_sync), ("overlap", run_overlap)):
            outs = run()                             # compile + warm
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                outs = run()
                best = min(best, time.perf_counter() - t0)
            per = best / len(batches)
            assert all(o.shape[0] == BATCH for o in outs)
            print(f"serve_bench mode={args.mode}/{name} config={args.config} "
                  f"batch={BATCH} stream={len(batches)}: {per * 1e3:.2f} "
                  f"ms/batch = {BATCH / per:.1f} img/s", flush=True)
        # parity: overlapped grades == sync grades on the same batches
        s, o = run_sync(), run_overlap()
        mism = sum(int((a != b).sum()) for a, b in zip(s, o))
        print(f"grade parity sync vs overlap: {mism} mismatches "
              f"/ {len(batches) * BATCH}", flush=True)
        return

    if args.mode == "live":
        fn = lambda: pipe.infer_grades(gray)  # noqa: E731
        best = timeit(fn)
    else:
        from unet_goolenet_tpu.pipeline.export import (export_serving,
                                                       load_serving)
        with tempfile.TemporaryDirectory() as d:
            export_serving(pipe, d, raw_hw=IMG_HW,
                           static_batch=args.static_batch or None,
                           # production-default pipes may carry Pallas levels
                           # (same-version same-backend artifact is fine for
                           # a benchmark box)
                           keep_fused=args.config == "default")
            runner = load_serving(d)
        if args.mode == "artifact":
            best = timeit(lambda: runner(gray))
        else:
            from unet_goolenet_tpu.pipeline.serving import MicroBatcher
            host_gray = np.asarray(gray)      # batcher ingests host images
            mb = MicroBatcher(runner, max_batch=BATCH, max_wait_ms=50.0)
            try:
                best = timeit(lambda: mb.grade_many(list(host_gray)))
            finally:
                mb.close()

    print(f"serve_bench mode={args.mode} config={args.config} "
          f"static_batch={args.static_batch or 'poly'} dtype={args.dtype} "
          f"batch={BATCH} raw={IMG_HW}: best {best * 1e3:.2f} ms/batch = "
          f"{BATCH / best:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
