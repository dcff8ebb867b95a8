"""Headline benchmark: end-to-end two-stage images/sec/chip on the default backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured path is the fused on-device pipeline (wavelet -> resize -> UNet ->
bbox -> crop -> GoogLeNet -> argmax) from unet_goolenet_tpu.pipeline, bf16 compute,
batch 16 — BASELINE.json config 5's single-chip core. `vs_baseline` divides by the
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
BATCH = 16
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
    pipe = TwoStagePipeline(unet, uv, gnet, gv, img_size=SIZE, dtype=dtype)

    # Generate distinct input batches ON DEVICE (jax.random): the bench measures
    # the chip's steady-state pipeline throughput, not host-link bandwidth (the
    # dev tunnel moves ~1 MB/s; staging real batches through it would swamp the
    # measurement).
    grays = [
        jax.random.uniform(jax.random.PRNGKey(i), (BATCH,) + IMG_HW,
                           jnp.float32, 0.0, 255.0)
        for i in range(4)
    ]
    grays = [g.block_until_ready() for g in grays]
    _ = np.asarray(pipe.infer_grades(grays[0]))  # compile + warmup

    n_iters = 20
    # Accumulate each batch's grades into a device buffer and fetch ONCE at the
    # end: every batch is genuinely processed (the final fetch depends on all of
    # them), but per-iteration host round-trip latency (tens of ms on the dev
    # tunnel) stays off the steady-state number.
    import jax.numpy as jnp2

    acc = jax.device_put(jnp2.zeros((n_iters, BATCH), jnp2.int32))
    set_row = jax.jit(lambda acc, i, g: acc.at[i].set(g))
    t0 = time.perf_counter()
    for i in range(n_iters):
        grades = pipe.infer_grades(grays[i % len(grays)])
        acc = set_row(acc, i, grades)
    all_grades = np.asarray(acc)  # single fetch forces the whole chain
    dt = time.perf_counter() - t0
    assert all_grades.shape == (n_iters, BATCH)
    return n_iters * BATCH / dt


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
