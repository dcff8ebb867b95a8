"""Stage-by-stage timing of the fused e2e graph on the real chip (VERDICT r1 #4).

Decomposes the north-star pipeline (gray -> wavelet -> resize -> UNet -> bbox ->
crop -> GoogLeNet) into separately-scan-timed jits so the throughput budget is
attributable, and sweeps batch size for the full graph. Timing methodology per
memory/axon-tpu-tunnel-rules: ONE jitted lax.scan over K device-resident batches,
fetch one tiny result to force execution; per-call time = total / K.

Usage: python benchmarks/profile_e2e.py [--batches 16 32 64] [--iters 10]
Writes a markdown table to stdout (paste into benchmarks/RESULTS.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unet_goolenet_tpu.models import GoogLeNetClassifier, UNetTaskAligWeight
from unet_goolenet_tpu.pipeline import TwoStagePipeline, engine
from unet_goolenet_tpu.pipeline.two_stage import (
    extract_roi,
    preprocess_gray,
    segment,
)

RAW_HW = (400, 500)
SIZE = 224


def scan_time(fn, xs, *consts, iters=3):
    """fn(c, x) applied over xs (K leading axis) in one jit; returns sec/step."""
    k = jax.tree_util.tree_leaves(xs)[0].shape[0]

    @jax.jit
    def run(consts, xs):
        def body(_, x):
            out = fn(*consts, x)
            # reduce to a scalar so nothing big leaves the scan
            return _, jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out, 0.0)

        _, outs = jax.lax.scan(body, 0, xs)
        return outs

    _ = np.asarray(run(consts, xs))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(run(consts, xs))
        best = min(best, time.perf_counter() - t0)
    return best / k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32, 64, 128])
    ap.add_argument("--scan-len", type=int, default=10)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    unet = UNetTaskAligWeight(n_classes=1, dtype=dtype)
    gnet = GoogLeNetClassifier(num_classes=6, dtype=dtype)
    uv = unet.init({"params": key}, jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    gv = gnet.init({"params": key, "dropout": key},
                   jnp.zeros((1, SIZE, SIZE, 3)), train=False)

    K = args.scan_len
    rows = []
    b0 = args.batches[0]
    gray = jax.random.uniform(key, (K, b0) + RAW_HW, jnp.float32, 0.0, 255.0)
    rgb = jax.random.uniform(key, (K, b0, SIZE, SIZE, 3), jnp.float32)
    rgbh = rgb.astype(dtype)
    masks = (jax.random.uniform(key, (K, b0, SIZE, SIZE)) > 0.7).astype(jnp.float32)

    # --- stage decomposition at the base batch ------------------------------
    t_pre = scan_time(lambda g: preprocess_gray(g, out_hw=(SIZE, SIZE)), gray,
                      iters=args.iters)
    t_pre_mxu = scan_time(
        lambda g: preprocess_gray(g, out_hw=(SIZE, SIZE), mxu_layout=True),
        gray, iters=args.iters)
    t_unet = scan_time(lambda v, x: unet.apply(v, x, train=False), rgbh, uv,
                       iters=args.iters)
    t_eng = scan_time(lambda v, x: engine.unet_forward(v, x), rgbh, uv,
                      iters=args.iters)
    # roi takes (imgs, masks): scan over the pair
    def _roi(v, xs):
        crops, _ = extract_roi(xs[0], xs[1], out_hw=(SIZE, SIZE))
        return crops

    t_roi = scan_time(_roi, (rgbh, masks), 0, iters=args.iters)

    def _roi_mm(v, xs):
        crops, _ = extract_roi(xs[0], xs[1], out_hw=(SIZE, SIZE), matmul=True)
        return crops

    t_roi_mm = scan_time(_roi_mm, (rgbh, masks), 0, iters=args.iters)
    t_gnet = scan_time(lambda v, x: gnet.apply(v, x, train=False), rgbh, gv,
                       iters=args.iters)
    t_gnet_eng = scan_time(lambda v, x: engine.gnet_forward(v, x), rgbh, gv,
                           iters=args.iters)
    t_gnet_s2d = scan_time(
        lambda v, x: engine.gnet_forward(v, x, s2d_stem=True), rgbh, gv,
        iters=args.iters)

    print(f"\n## stage decomposition @ batch {b0} (bf16, ms/batch)\n")
    print("| stage | ms | ms/img |")
    print("|---|---|---|")
    for name, t in (("preprocess (wavelet+resize)", t_pre),
                    ("preprocess (mxu NCHW resize)", t_pre_mxu),
                    ("UNet fwd (flax apply)", t_unet),
                    ("UNet fwd (BN-folded engine)", t_eng),
                    ("ROI bbox+crop", t_roi),
                    ("ROI bbox+crop (matmul form)", t_roi_mm),
                    ("GoogLeNet fwd", t_gnet),
                    ("GoogLeNet fwd (engine)", t_gnet_eng),
                    ("GoogLeNet fwd (engine, s2d stem)", t_gnet_s2d)):
        print(f"| {name} | {t*1e3:.2f} | {t*1e3/b0:.3f} |")

    # --- full e2e batch sweep ------------------------------------------------
    print("\n## full fused e2e, batch sweep (bf16)\n")
    print("| batch | ms/batch | img/s |")
    print("|---|---|---|")
    for b in args.batches:
        pipe = TwoStagePipeline(unet, uv, gnet, gv, img_size=SIZE, dtype=dtype)
        e2e = pipe._grades.__wrapped__
        g = jax.random.uniform(key, (K, b) + RAW_HW, jnp.float32, 0.0, 255.0)
        t = scan_time(lambda u, gv_, x: e2e(u, gv_, x), g, uv, gv,
                      iters=args.iters)
        print(f"| {b} | {t*1e3:.2f} | {b/t:.0f} |", flush=True)


if __name__ == "__main__":
    main()
