"""Headline benchmark: end-to-end two-stage images/sec/chip on the default backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured path is the fused on-device pipeline (wavelet -> resize -> UNet ->
bbox -> crop -> GoogLeNet -> argmax) from unet_goolenet_tpu.pipeline, bf16 compute,
batch 128 (BATCH below; the measured-best point of the r2b batch sweep) —
BASELINE.json config 5's single-chip core. `vs_baseline` divides by the
reference-style torch-CPU flow (benchmarks/torch_baseline.py); the measured CPU
number is cached in benchmarks/baseline_cpu.json after the first run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "baseline_cpu.json")
# measured best (r2b packed sweep: 64->1070, 128->1193, 192->1083, 256->1172;
# queue-6 dense sweep: 128->1313.6, 192->1122, 256->1245 — b128 wins both);
# BENCH_BATCH env overrides for sweeps (official number = the default)
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
IMG_HW = (400, 500)  # raw ultrasound-ish input size
SIZE = 224


def measure_ours() -> float:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from unet_goolenet_tpu.models import UNetTaskAligWeight, GoogLeNetClassifier
    from unet_goolenet_tpu.pipeline import TwoStagePipeline

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    unet = UNetTaskAligWeight(n_classes=1, dtype=dtype)
    gnet = GoogLeNetClassifier(num_classes=6, dtype=dtype)
    uv = unet.init({"params": key}, jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    gv = gnet.init({"params": key, "dropout": key},
                   jnp.zeros((1, SIZE, SIZE, 3)), train=False)

    # BENCH_FUSED=0 forces every fused Pallas level off, BENCH_FUSED=1 forces
    # all of them on (A/B sweeps); default = TwoStagePipeline's production
    # defaults (measured winners: fused up1 on the packed path, dense engine
    # forward at batch >= 128 — queue-5 whole-forward A/B in RESULTS.md).
    fused_env = os.environ.get("BENCH_FUSED")
    fused_kw = {}
    if fused_env is not None:
        v = fused_env != "0"
        fused_kw = dict(fused_up1=v, fused_up2=v, fused_up34=v, fused_down1=v)
    # BENCH_MODE=dense forces the PLAIN dense engine forward (no fused tail);
    # BENCH_MODE=dense_fused forces the hybrid (dense trunk + packed fused
    # up1+outc Pallas tail — the production default at batch >= 128 since
    # queue 9 measured it winning, 1325.6 vs 1313.6 img/s);
    # BENCH_MODE=packed forces the packed(+fused per BENCH_FUSED) one.
    # Default: the pipeline's batch-aware production policy.
    mode_env = os.environ.get("BENCH_MODE")
    if mode_env == "dense":
        fused_kw["dense_batch_min"] = 1
        fused_kw["dense_fused_up1"] = False
    elif mode_env == "dense_fused":
        fused_kw["dense_batch_min"] = 1
        fused_kw["dense_fused_up1"] = True
    elif mode_env == "packed":
        fused_kw["dense_batch_min"] = 10 ** 9
    # BENCH_UP2=packed|fused moves the hybrid's dense->packed switch point to
    # the up2 level (engine.unet_forward up2 kwarg; only affects the dense
    # branch when the fused up1 tail is on)
    up2_env = os.environ.get("BENCH_UP2")
    if up2_env in ("packed", "fused", "fused_dense"):
        fused_kw["dense_up2"] = up2_env
    # BENCH_UP34=1 runs the dense branch's up3/up4 as the dense fused Pallas
    # kernels (runnable since the sublane-alignment fix; queue-20 A/B)
    if os.environ.get("BENCH_UP34") == "1":
        fused_kw["dense_up34"] = True
    # BENCH_GLUE=0 turns OFF the MXU-form serving glue (NCHW-layout preprocess
    # resize, weight-matrix ROI crop, space-to-depth GoogLeNet stem) that is
    # default-on on TPU — the A/B for that default-on policy (queue 14).
    # BENCH_FAST_RESIZE=1 opts into the bf16-precision preprocess resize
    # (~1 uint8-level value delta — NOT the parity default; A/B knob only)
    if os.environ.get("BENCH_FAST_RESIZE") == "1":
        fused_kw["fast_resize"] = True
    # BENCH_GNET_MERGE=1 fuses each inception module's three same-input 1x1
    # convs into one (exact math; A/B knob, benchmarks/gnet_attr.py)
    if os.environ.get("BENCH_GNET_MERGE") == "1":
        fused_kw["gnet_merge_1x1"] = True
    glue_env = os.environ.get("BENCH_GLUE")
    if glue_env is not None:
        v = glue_env != "0"
        fused_kw.update(mxu_preprocess=v, mxu_roi=v, s2d_stem=v)

    def build(**kw):
        pipe = TwoStagePipeline(unet, uv, gnet, gv, img_size=SIZE, dtype=dtype,
                                **kw)
        # Steady-state chip throughput: ONE jitted lax.scan over n_iters
        # distinct batches generated on device (the dev tunnel adds ~12 ms per
        # dispatch and ~24 ms per fetch; a python-side loop measures the
        # tunnel, not the chip). Every batch is genuinely processed — the
        # single final fetch depends on all scan steps.
        e2e = pipe._grades.__wrapped__

        @jax.jit
        def run_many(unet_vars, gnet_vars, grays):
            def body(_, g):
                return _, e2e(unet_vars, gnet_vars, g)

            _, all_grades = jax.lax.scan(body, 0, grays)
            return all_grades

        return pipe, run_many

    n_iters = 20
    grays = jax.random.uniform(
        jax.random.PRNGKey(0), (n_iters, BATCH) + IMG_HW, jnp.float32, 0.0, 255.0)
    pipe, run_many = build(**fused_kw)
    try:
        _ = np.asarray(run_many(pipe.unet_vars, pipe.gnet_vars, grays))  # compile
    except Exception as e:  # pragma: no cover - chip-compile guard
        # A fused Pallas level failing to COMPILE (e.g. a scoped-vmem limit on
        # a new libtpu) must not cost the headline: fall back to the packed
        # XLA graph, which is the measured r2b configuration.
        print(f"[bench] fused pipeline compile failed ({type(e).__name__}); "
              f"falling back to packed XLA graph", file=sys.stderr)
        # Preserve every explicit A/B env override (BENCH_GLUE / BENCH_MODE /
        # BENCH_UP2 / ...) in the fallback build — only the Pallas fused
        # levels are disabled. Otherwise a BENCH_GLUE=0 run that trips this
        # path would silently measure the glue-ON configuration (ADVICE r3).
        fb_kw = dict(fused_kw, fused_up1=False, fused_up2=False,
                     fused_up34=False, fused_down1=False,
                     dense_fused_up1=False)
        pipe, run_many = build(**fb_kw)
        _ = np.asarray(run_many(pipe.unet_vars, pipe.gnet_vars, grays))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = np.asarray(run_many(pipe.unet_vars, pipe.gnet_vars, grays))
        best = min(best, time.perf_counter() - t0)
    assert out.shape == (n_iters, BATCH)
    return n_iters * BATCH / best


def baseline_cpu() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return float(json.load(f)["images_per_sec"])
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "benchmarks"))
    from torch_baseline import run_e2e_baseline

    ips = run_e2e_baseline(n_images=8, image_hw=IMG_HW, img_size=SIZE)
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"images_per_sec": ips, "config":
                   f"torch-cpu e2e two-stage, {IMG_HW} in, {SIZE} model"}, f)
    return ips


def main() -> None:
    ours = measure_ours()
    base = baseline_cpu()
    print(json.dumps({
        "metric": "e2e_two_stage_throughput",
        "value": round(ours, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ours / base, 3),
    }))


if __name__ == "__main__":
    main()
