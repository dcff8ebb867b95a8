"""Per-level timing + achieved-TFLOPs table for the flagship UNet forward.

Answers VERDICT r1 #4's "where does the other 2/3 of the roofline go":
scan-times each encoder/decoder level of the BN-folded engine forward in
isolation on the real chip, computes each level's conv FLOPs analytically, and
prints achieved TFLOP/s + % of the measured 205 TFLOP/s matmul roofline.

Methodology per memory/axon-tpu-tunnel-rules: ONE jitted lax.scan over K
device-resident inputs per level, fetch a scalar; per-call = total/K.

Usage: python benchmarks/profile_unet_levels.py [--batch 64] [--scan-len 50]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unet_goolenet_tpu.models import UNetTaskAligWeight
from unet_goolenet_tpu.pipeline import engine
from unet_goolenet_tpu.pipeline.engine import _cbn, _stack, _up_alig, _transformer

SIZE = 224
ROOFLINE_TFLOPS = 205.0  # measured big-matmul bf16 (benchmarks/RESULTS.md r1)


def scan_time(fn, xs, iters=3, k=50):
    """One base input tree; each scan step perturbs it by a per-step scalar
    (cheap elementwise pass) so XLA cannot CSE/hoist the body, without
    materialising k full copies in HBM."""

    @jax.jit
    def run(xs, steps):
        def body(_, s):
            x = jax.tree_util.tree_map(lambda t: t * (1 + s).astype(t.dtype), xs)
            out = fn(x)
            return _, jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out, 0.0)

        _, outs = jax.lax.scan(body, 0, steps)
        return outs

    steps = jnp.arange(k, dtype=jnp.float32) * 1e-6
    _ = np.asarray(run(xs, steps))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(run(xs, steps))
        best = min(best, time.perf_counter() - t0)
    return best / k


def conv_flops(h, w, cin, cout, k=3):
    return 2 * h * w * cin * cout * k * k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--scan-len", type=int, default=50)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--rows-only", action="store_true",
                    help="skip the per-level section; run only the "
                         "whole-forward rows")
    ap.add_argument("--row-filter", default=None,
                    help="run only whole-forward rows whose name contains "
                         "this substring")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    b = args.batch
    K = args.scan_len
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    unet = UNetTaskAligWeight(n_classes=1, dtype=dtype)
    uv = unet.init({"params": key}, jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    p, s = uv["params"], uv["batch_stats"]
    t, ts = p["trunk"], s["trunk"]

    def rnd(shape):
        return jax.random.normal(key, (b,) + shape, jnp.float32).astype(dtype)

    # (name, fn(x)->y, input shape (H,W,C), flops per image)
    ch = [64, 128, 256, 512, 512]
    hw = [224, 112, 56, 28, 14]
    levels = []

    levels.append(("inc 3->64 @224", lambda x: _cbn(x, t["inc"], ts["inc"]),
                   (224, 224, 3), conv_flops(224, 224, 3, 64)))
    for i in range(1, 5):
        cin, cout, hwi = ch[i - 1], ch[i], hw[i]
        fl = conv_flops(hwi, hwi, cin, cout) + conv_flops(hwi, hwi, cout, cout)
        levels.append((
            f"down{i} {cin}->{cout} @{hwi}",
            functools.partial(
                lambda x, i=i: _stack(
                    jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                          (1, 2, 2, 1), (1, 2, 2, 1), "VALID"),
                    t[f"down{i}"]["nConvs"], ts[f"down{i}"]["nConvs"])),
            (hw[i - 1], hw[i - 1], cin), fl))

    levels.append((
        "transformer @14 (512d x2 layers)",
        lambda x: _transformer(x, x, p["task2"], s["task2"])[1],
        (14, 14, 512),
        # qkv+out per self-attn (x2 streams) + cross (shared) + mlp, 2 layers,
        # 196 tokens, d=512, mlp 1024
        2 * (2 * (4 * 196 * 512 * 512 * 2) + 2 * (4 * 196 * 512 * 512 * 2)
             + 2 * (2 * 196 * 512 * 1024 * 2) + 4 * (2 * 196 * 196 * 512 * 2))
        + 2 * conv_flops(14, 14, 512, 512)))

    # decoder levels: x from below (C), skip (C/2 except up4: 512,512)
    dec = [("up4", 512, 512, 28, 256), ("up3", 256, 256, 56, 128),
           ("up2", 128, 128, 112, 64), ("up1", 64, 64, 224, 64)]
    for name, cx, cskip, hwo, cout in dec:
        # upconv (2x2) + cca(conv1_e 3x3 on skip, conv2_e 3x3 on up, 3 fc 1x1)
        # + 2 convs on concat(2*cskip -> cout -> cout)... concat is (up cskip + gated cskip)
        fl = (2 * hwo * hwo * cx * cskip * 1  # upconv 2x2 = 4 taps at half res = 1 eff
              * 4 // 4 + conv_flops(hwo, hwo, cskip, cskip)  # conv1_e
              + conv_flops(hwo, hwo, cskip, cskip)  # conv2_e
              + conv_flops(hwo, hwo, 2 * cskip, cout)
              + conv_flops(hwo, hwo, cout, cout))
        fl += 2 * (hwo // 2) * (hwo // 2) * cx * (cskip * 4)  # upconv matmul
        x_shape = (hwo // 2, hwo // 2, cx)
        skip_shape = (hwo, hwo, cskip)

        def fn(xs, name=name):
            x, skip = xs
            return _up_alig(x, skip, p[name], s[name])

        levels.append((f"{name} cca+2conv @{hwo}",
                       fn, (x_shape, skip_shape), fl))

    print(f"\n## UNet per-level timing @ batch {b}, bf16, scan {K} (engine fwd)\n")
    print("| level | ms/batch | GFLOP/img | TFLOP/s | % roofline |")
    print("|---|---|---|---|---|")
    total_ms = 0.0
    total_fl = 0.0
    for name, fn, shape, fl in levels:
        total_fl += fl
        if args.rows_only:
            continue
        if isinstance(shape[0], tuple):
            xs = tuple(rnd(sh) for sh in shape)
        else:
            xs = rnd(shape)
        sec = scan_time(fn, xs, iters=args.iters, k=K)
        tf = fl * b / sec / 1e12
        total_ms += sec * 1e3
        print(f"| {name} | {sec*1e3:.2f} | {fl/1e9:.2f} | {tf:.1f} "
              f"| {100*tf/ROOFLINE_TFLOPS:.0f}% |", flush=True)

    # whole forward for comparison (fusion across levels not captured above).
    # Each row is independent: a Mosaic reject in one experimental fused set
    # (fused_up34 is known to fail real lowering, two_stage.py:136-140) must
    # not kill the rows that follow it.
    x = rnd((224, 224, 3))
    rows = [
        ("dense", lambda x: engine.unet_forward(uv, x)),
        ("dense+fused up1 hybrid",
         lambda x: engine.unet_forward(uv, x, fused_up1=True)),
        ("hybrid, packed-xla up2",
         lambda x: engine.unet_forward(uv, x, fused_up1=True, up2="packed")),
        ("hybrid, fused up2",
         lambda x: engine.unet_forward(uv, x, fused_up1=True, up2="fused")),
        ("packed", lambda x: engine.unet_forward_packed(uv, x)),
        ("packed+fused up1",
         lambda x: engine.unet_forward_packed(uv, x, fused_up1=True)),
        ("packed+fused up1+up2",
         lambda x: engine.unet_forward_packed(uv, x, fused_up1=True,
                                              fused_up2=True)),
        ("all fused",
         lambda x: engine.unet_forward_packed(uv, x, fused_up1=True,
                                              fused_up2=True, fused_up34=True,
                                              fused_down1=True)),
    ]
    for name, fn in rows:
        if args.row_filter and args.row_filter not in name:
            continue
        try:
            sec = scan_time(fn, x, iters=args.iters, k=K)
        except Exception as e:  # Mosaic lowering reject, OOM, ...
            print(f"| **full engine fwd ({name})** | n/a "
                  f"({type(e).__name__}: {str(e).splitlines()[0][:90]}) "
                  f"| {total_fl/1e9:.2f} | - | - |", flush=True)
            continue
        tf = total_fl * b / sec / 1e12
        print(f"| **full engine fwd ({name})** | {sec*1e3:.2f} "
              f"| {total_fl/1e9:.2f} | {tf:.1f} "
              f"| {100*tf/ROOFLINE_TFLOPS:.0f}% |", flush=True)
    print(f"\nsum of levels = {total_ms:.2f} ms (full fwd measured separately; "
          f"delta = cross-level fusion + scan overhead)")


if __name__ == "__main__":
    main()
