"""Whole-graph attribution of the hybrid forward at the official batch 128
(VERDICT r3 ask #5: 'publish the missing 38%').

The b128 hybrid forward (dense trunk + packed fused up1+outc tail) runs at
~62% of the matmul roofline; this script buckets the full e2e step into
per-level and per-glue pieces, each scan-timed in isolation at b128 bf16, and
prints measured ms vs the MXU-ideal ms for that bucket's logical FLOPs
(205 TFLOP/s bf16 — the measured chained-matmul peak on this chip, RESULTS.md
r1). The sum of buckets is checked against the separately-timed full forward
so nothing hides in 'unattributed'.

Buckets: preprocess | inc | down1..4 | transformer | up4 | up3 | up2 |
pack boundary | gate pass (fused_cbn_stats + 1x1s) | fused up1+outc kernel |
unpack | ROI (matmul form) | GoogLeNet (s2d stem) | argmax/dispatch rest.

CSE defeat per memory/axon-tpu-tunnel-rules: each scan step perturbs the
input by a step-dependent epsilon; one scalar fetch at the end.

Usage: python benchmarks/attr_b128.py [--batch 128] [--scan-len 30]
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
from unet_goolenet_tpu.pipeline.two_stage import extract_roi, preprocess_gray
from unet_goolenet_tpu.ops import packed as P

RAW_HW = (400, 500)
SIZE = 224
PEAK_TFLOPS = 205.0  # measured chained 4096^3 bf16 matmul rate on this chip

# logical GFLOP/image per level (dense forward; benchmarks/RESULTS.md r2b map)
GFLOP = {
    "inc": 0.17, "down1": 5.55, "down2": 5.55, "down3": 5.55, "down4": 1.85,
    "transformer": 7.41, "up4": 12.85, "up3": 12.85, "up2": 12.85,
    "up1+outc": 19.32,
    # non-UNet stages (rough): GoogLeNet ~3.0, preprocess/ROI ~0 (bandwidth)
    "gnet": 3.0, "preprocess": 0.0, "roi": 0.0,
}


def scan_time(fn, base, k, iters=3):
    """Time fn(x)-like closures: ONE jitted scan over k steps, input perturbed
    per step (x * (1 + 1e-6*i)) so XLA cannot CSE; returns sec/step."""

    @jax.jit
    def run(base, steps):
        def body(_, i):
            x = jax.tree_util.tree_map(
                lambda b: b * (1 + 1e-6 * i.astype(b.dtype)), base)
            out = fn(x)
            return _, jax.tree_util.tree_reduce(
                lambda a, o: a + jnp.sum(o.astype(jnp.float32)), out, 0.0)

        _, outs = jax.lax.scan(body, 0, steps)
        return outs

    steps = jnp.arange(k)
    _ = np.asarray(run(base, steps))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(run(base, steps))
        best = min(best, time.perf_counter() - t0)
    return best / k


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--scan-len", type=int, default=30)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    b, K = args.batch, args.scan_len

    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    unet = UNetTaskAligWeight(n_classes=1, dtype=dtype)
    gnet = GoogLeNetClassifier(num_classes=6, dtype=dtype)
    uv = unet.init({"params": key}, jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    gv = gnet.init({"params": key, "dropout": key},
                   jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    p, s = uv["params"], uv["batch_stats"]
    t, ts = p["trunk"], s["trunk"]

    def rnd(*shape):
        return jax.random.uniform(key, shape, jnp.float32).astype(dtype)

    rows = []

    def add(name, sec):
        ms = sec * 1e3
        ideal = GFLOP.get(name, 0.0) * b / PEAK_TFLOPS  # ms
        pct = f"{100 * ideal / ms:.0f}%" if ideal else "—"
        rows.append((name, ms, ideal, pct))
        print(f"  {name}: {ms:.2f} ms (ideal {ideal:.2f}, {pct})", flush=True)

    # ---- trunk levels -------------------------------------------------------
    x1 = rnd(b, SIZE, SIZE, 64)
    add("inc", scan_time(
        lambda x: engine._cbn(x, t["inc"], ts["inc"]), rnd(b, SIZE, SIZE, 3),
        K, args.iters))

    def level(i, cin, hw):
        def f(x):
            h = jax.lax.stop_gradient(x)
            from unet_goolenet_tpu import ops
            h = ops.max_pool2d(h, 2)
            return engine._stack(h, t[f"down{i}"]["nConvs"],
                                 ts[f"down{i}"]["nConvs"])
        return f, rnd(b, hw, hw, cin)

    for i, (cin, hw) in enumerate([(64, 224), (128, 112), (256, 56),
                                   (512, 28)], start=1):
        f, base = level(i, cin, hw)
        add(f"down{i}", scan_time(f, base, K, args.iters))
        del base

    f4 = rnd(b, 14, 14, 512)
    add("transformer", scan_time(
        lambda x: engine._transformer(x, x, p["task2"], s["task2"])[1],
        f4, K, args.iters))

    # ---- dense decoder levels ----------------------------------------------
    for name, (ch_in, hw_in, skip_ch, skip_hw, pkey) in {
        "up4": (512, 14, 512, 28, "up4"),
        "up3": (256, 28, 256, 56, "up3"),
        "up2": (128, 56, 128, 112, "up2"),
    }.items():
        base = (rnd(b, hw_in, hw_in, ch_in), rnd(b, skip_hw, skip_hw, skip_ch))
        add(name, scan_time(
            lambda xs, pk=pkey: engine._up_alig(xs[0], xs[1], p[pk], s[pk]),
            base, K, args.iters))
        del base

    # ---- pack boundary + fused tail ----------------------------------------
    y_up2 = rnd(b, 112, 112, 64)
    add("pack(y)+pack(x1)", scan_time(
        lambda xs: (P.pack(xs[0]), P.pack(xs[1])), (y_up2, x1), K, args.iters))

    x1_p = P.pack(x1)
    from unet_goolenet_tpu.ops.pallas import up1 as PU
    w_e1, b_e1 = engine._fold(p["up1"]["cca"]["conv1_e"]["block0"],
                              s["up1"]["cca"]["conv1_e"]["block0"])
    add("gate pass (cbn_stats)", scan_time(
        lambda x: PU.fused_cbn_stats(x, w_e1, b_e1), x1_p, K, args.iters))

    y_p = P.pack(y_up2)
    add("fused up1+outc kernel", scan_time(
        lambda xs: engine.unet_forward_packed_tail_fused(
            uv, xs[0], xs[1], dtype), (y_p, x1_p), K, args.iters))
    del y_p, x1_p, y_up2

    # ---- whole hybrid forward + the rest of e2e -----------------------------
    x_in = rnd(b, SIZE, SIZE, 3)
    t_fwd = scan_time(lambda x: engine.unet_forward(uv, x, fused_up1=True),
                      x_in, K, args.iters)
    del x_in

    gray = jax.random.uniform(key, (b,) + RAW_HW, jnp.float32, 0.0, 255.0)
    add("preprocess (mxu)", scan_time(
        lambda g: preprocess_gray(g, out_hw=(SIZE, SIZE), mxu_layout=True),
        gray, K, args.iters))
    del gray

    rgb = rnd(b, SIZE, SIZE, 3)
    masks = (jax.random.uniform(key, (b, SIZE, SIZE)) > 0.7).astype(dtype)
    add("roi (matmul)", scan_time(
        lambda xs: extract_roi(xs[0], xs[1], out_hw=(SIZE, SIZE),
                               matmul=True)[0], (rgb, masks), K, args.iters))
    del masks

    add("gnet (s2d)", scan_time(
        lambda x: engine.gnet_forward(gv, x, s2d_stem=True), rgb, K,
        args.iters))
    del rgb

    pipe = TwoStagePipeline(unet, uv, gnet, gv, img_size=SIZE, dtype=dtype)
    gray = jax.random.uniform(key, (b,) + RAW_HW, jnp.float32, 0.0, 255.0)
    e2e = pipe._grades.__wrapped__
    t_e2e = scan_time(lambda g: e2e(pipe.unet_vars, pipe.gnet_vars, g), gray,
                      K, args.iters)

    # ---- report -------------------------------------------------------------
    unet_buckets = [r for r in rows if r[0] not in
                    ("preprocess (mxu)", "roi (matmul)", "gnet (s2d)")]
    unet_sum = sum(r[1] for r in unet_buckets)
    other = [r for r in rows if r[0] in
             ("preprocess (mxu)", "roi (matmul)", "gnet (s2d)")]
    print(f"\n## hybrid forward attribution @ b{b} (bf16, ms/batch, "
          f"ideal = logical FLOPs at {PEAK_TFLOPS:.0f} TFLOP/s)\n")
    print("| bucket | measured ms | MXU-ideal ms | % of ideal |")
    print("|---|---|---|---|")
    for name, ms, ideal, pct in rows:
        print(f"| {name} | {ms:.2f} | {ideal:.2f} | {pct} |")
    print(f"| **UNet buckets sum** | **{unet_sum:.2f}** | | |")
    print(f"| UNet hybrid fwd (one jit) | {t_fwd*1e3:.2f} | | |")
    print(f"| cross-level fusion credit (sum - one-jit) | "
          f"{unet_sum - t_fwd*1e3:.2f} | | |")
    e2e_named = t_fwd * 1e3 + sum(r[1] for r in other)
    print(f"| e2e (one jit) | {t_e2e*1e3:.2f} | | |")
    print(f"| e2e unattributed (e2e - fwd - pre/roi/gnet) | "
          f"{t_e2e*1e3 - e2e_named:.2f} | | |")
    print(f"\nimg/s at b{b}: {b / t_e2e:.1f}", flush=True)


if __name__ == "__main__":
    main()
