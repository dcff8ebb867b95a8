"""Per-level forward vs forward+backward timing for the packed train forward.

The queue-3 whole-step profile (benchmarks/train_profile.py) showed the
backward pass is 6.1x the forward (14.5 vs 2.38 ms at batch 8 bf16 packed) —
this script locates WHERE: it scan-times each level of
pipeline/engine_train.unet_forward_packed_train in isolation, forward-only and
under jax.grad (w.r.t. that level's params AND its inputs, i.e. the real
training dataflow), and prints the bwd/fwd ratio per level. The worst ratios
are the candidates for Pallas backward kernels (recompute-in-bwd, dw summed
across the sequential grid as in ops/pallas/conv.py).

Methodology per memory/axon-tpu-tunnel-rules: ONE jitted lax.scan over K
steps, inputs perturbed per step so XLA can't CSE, one scalar fetch.

Usage: python benchmarks/bwd_profile.py [--batch 8] [--scan-len 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unet_goolenet_tpu import ops
from unet_goolenet_tpu.models import UNetTaskAligWeight
from unet_goolenet_tpu.ops import packed as P
from unet_goolenet_tpu.pipeline import engine_train as ET

SIZE = 224


def scan_time(fn, operands, k, iters=3):
    """fn(operands) -> scalar; times one jitted scan of k perturbed calls."""

    @jax.jit
    def run(operands, steps):
        def body(_, sc):
            xs = jax.tree_util.tree_map(
                lambda t: t * (1 + sc).astype(t.dtype), operands)
            return _, fn(xs)

        _, outs = jax.lax.scan(body, 0, steps)
        return outs

    steps = jnp.arange(k, dtype=jnp.float32) * 1e-6
    _ = np.asarray(run(operands, steps))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(run(operands, steps))
        best = min(best, time.perf_counter() - t0)
    return best / k * 1000.0


# forward logical GFLOP/img per level (benchmarks/profile_unet_levels.py map;
# matmul-only, the MXU roofline accounting used by attr_b128). The backward's
# MXU ideal is 2x the forward's (dgrad + wgrad are each ~one conv of the same
# logical FLOPs; bias/BN reductions are bandwidth noise at these sizes).
FWD_GFLOP_IMG = {
    "inc": 0.17, "pool+down1": 5.55, "pool+down2": 5.55, "pool+down3": 5.55,
    "pool+down4": 1.85, "transformer": 7.41, "up4": 12.85, "up3": 12.85,
    "up2": 12.85, "up1 p": 19.32, "up1 DENSE": 19.32, "outc": 0.013,
}
MXU_TFLOPS = 205.0  # measured chained-matmul peak on this v5e (RESULTS.md r1)


def _ideal_ms(name: str, batch: int) -> float | None:
    for k, g in FWD_GFLOP_IMG.items():
        if name.startswith(k):
            return g * batch / MXU_TFLOPS
    return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scan-len", type=int, default=20)
    ap.add_argument("--f32", action="store_true",
                    help="profile in f32 (default bf16, the production mode)")
    ap.add_argument("--only", default=None,
                    help="substring filter on level names (smoke / retries)")
    ap.add_argument("--split-dw-dx", action="store_true",
                    help="additionally time grad w.r.t. inputs only (dgrad) "
                         "and w.r.t. params only (wgrad) per level — locates "
                         "which half of a slow backward is the problem")
    args = ap.parse_args(argv)

    b = args.batch
    K = args.scan_len
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    print(f"devices: {jax.devices()}")

    key = jax.random.PRNGKey(0)
    model = UNetTaskAligWeight(n_classes=1, dtype=dtype)
    uv = model.init({"params": key}, jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    p, s = uv["params"], uv["batch_stats"]
    t, ts = p["trunk"], s["trunk"]

    def rnd(*shape):
        return jax.random.normal(jax.random.PRNGKey(len(shape) + shape[-1]),
                                 shape, dtype) * 0.1

    # (name, params-subtree, stats-subtree, input arrays, fn(p, s, *xs)->tree)
    levels = []

    levels.append((
        "inc p 3->64 @224", t["inc"], ts["inc"], (rnd(b, 224, 112, 6),),
        lambda p_, s_, x: ET._cbn_t(x, p_, s_, packed=True)))

    levels.append((
        "pool+down1 64->128 @112", t["down1"]["nConvs"], ts["down1"]["nConvs"],
        (rnd(b, 224, 112, 128),),
        lambda p_, s_, x: ET._stack_t(P.max_pool2x2_p_to_dense(x), p_, s_,
                                      packed=False)))

    for i, (hw, cin) in zip(range(2, 5), ((112, 128), (56, 256), (28, 512))):
        levels.append((
            f"pool+down{i} @{hw // 2}", t[f"down{i}"]["nConvs"],
            ts[f"down{i}"]["nConvs"], (rnd(b, hw, hw, cin),),
            lambda p_, s_, x: ET._stack_t(ops.max_pool2d(x, 2), p_, s_,
                                          packed=False)))

    levels.append((
        "transformer @14", p["task2"], s["task2"], (rnd(b, 14, 14, 512),),
        lambda p_, s_, x: ET._transformer_t(x, x, p_, s_)))

    levels.append((
        "up4 @28", p["up4"], s["up4"],
        (rnd(b, 14, 14, 512), rnd(b, 28, 28, 512)),
        lambda p_, s_, x, sk: ET._up_alig_t(x, sk, p_, s_)))

    levels.append((
        "up3 @56", p["up3"], s["up3"],
        (rnd(b, 28, 28, 256), rnd(b, 56, 56, 256)),
        lambda p_, s_, x, sk: ET._up_alig_t(x, sk, p_, s_)))

    def up2_head(p_, s_, y, skip):
        up = ops.conv_transpose2x2(y, p_["up"]["kernel"].astype(y.dtype),
                                   p_["up"]["bias"].astype(y.dtype),
                                   accum_dtype=y.dtype)
        gated, _ = ET._coord_att3_t(skip, up, p_["cca"], s_["cca"],
                                    packed=False)
        w0 = p_["nConvs"]["block0"]["conv"]["conv"]["kernel"]
        c = up.shape[-1]
        y_p, _ = ET._split_sum_cbn_t(up, w0[:, :, :c], gated, w0[:, :, c:],
                                     p_["nConvs"]["block0"],
                                     s_["nConvs"]["block0"], up_variant=True)
        return ET._cbn_t(y_p, p_["nConvs"]["block1"], s_["nConvs"]["block1"],
                         packed=True)

    levels.append((
        "up2 head p-out @112", p["up2"], s["up2"],
        (rnd(b, 56, 56, 128), rnd(b, 112, 112, 128)), up2_head))

    levels.append((
        "up1 p @224", p["up1"], s["up1"],
        (rnd(b, 112, 56, 128), rnd(b, 224, 112, 128)),
        lambda p_, s_, x, sk: ET._up_alig_p_t(x, sk, p_, s_)))

    levels.append((
        "outc 1x1 p @224", p["outc"], None, (rnd(b, 224, 112, 128),),
        lambda p_, s_, x: P.conv1x1_p(x, p_["conv"]["kernel"][0, 0],
                                      p_["conv"]["bias"], accum=x.dtype)))

    # --- up1 sub-levels: decompose the dominant bwd chunk -------------------
    levels.append((
        "up1.deconv p @224", p["up1"]["up"], None, (rnd(b, 112, 56, 128),),
        lambda p_, s_, x: P.conv_transpose2x2_p(
            x, p_["kernel"].astype(x.dtype), p_["bias"].astype(x.dtype),
            accum=x.dtype)))

    levels.append((
        "up1.cca p @224", p["up1"]["cca"], s["up1"]["cca"],
        (rnd(b, 224, 112, 128), rnd(b, 224, 112, 128)),
        lambda p_, s_, sk, up: ET._coord_att3_t(sk, up, p_, s_,
                                                packed=True)[0]))

    def up1_splitsum(p_, s_, up_p, gated_p):
        w = p_["block0"]["conv"]["conv"]["kernel"]
        c = up_p.shape[-1] // 2
        out, _ = ET._split_sum_cbn_t(up_p, w[:, :, :c], gated_p, w[:, :, c:],
                                     p_["block0"], s_["block0"],
                                     up_variant=False)
        return out

    levels.append((
        "up1.splitsum p @224", p["up1"]["nConvs"], s["up1"]["nConvs"],
        (rnd(b, 224, 112, 128), rnd(b, 224, 112, 128)), up1_splitsum))

    levels.append((
        "up1.block1 p @224", p["up1"]["nConvs"]["block1"],
        s["up1"]["nConvs"]["block1"], (rnd(b, 224, 112, 128),),
        lambda p_, s_, x: ET._cbn_t(x, p_, s_, packed=True)[0]))

    # --- down1 dx diagnosis (queue-19: dx 2.68 of 3.24 bwd at 27% ideal):
    # is the slow half the pool backward (custom elementwise VJP over the
    # 224^2 packed tensor) or the 112^2 conv dgrads?
    levels.append((
        "down1.pool-only @224", {"_": jnp.zeros(())}, None,
        (rnd(b, 224, 112, 128),),
        lambda p_, s_, x: P.max_pool2x2_p_to_dense(x)))

    levels.append((
        "down1.convs-only @112", t["down1"]["nConvs"], ts["down1"]["nConvs"],
        (rnd(b, 112, 112, 64),),
        lambda p_, s_, x: ET._stack_t(x, p_, s_, packed=False)))

    # dense-up1 tail A/B support (engine_train dense_up1): the same level
    # as 'up1 p @224' but dense 64-channel — logical FLOPs, XLA dense bwd
    levels.append((
        "up1 DENSE @224", p["up1"], s["up1"],
        (rnd(b, 112, 112, 64), rnd(b, 224, 224, 64)),
        lambda p_, s_, x, sk: ET._up_alig_t(x, sk, p_, s_)))

    print(f"\n## packed train fwd vs fwd+bwd per level "
          f"@ batch {b}, {'f32' if args.f32 else 'bf16'}, scan {K}\n")
    hdr = "| level | fwd ms | fwd+bwd ms | bwd ms | bwd/fwd | 2xfwd ideal | bwd % ideal |"
    if args.split_dw_dx:
        hdr += " dx ms | dw ms |"
    print(hdr)
    print("|---|" + "---|" * (hdr.count("|") - 2))
    rows = {}
    tot_f = tot_fb = 0.0
    if args.only:
        levels = [lv for lv in levels if args.only in lv[0]]
    for name, p_sub, s_sub, xs, fn in levels:
        def fwd_scalar(ops_):
            p_, xs_ = ops_
            out = fn(p_, s_sub, *xs_)
            return jax.tree_util.tree_reduce(
                lambda a, v: a + jnp.sum(v.astype(jnp.float32)), out, 0.0)

        def fb_scalar(ops_):
            grads = jax.grad(fwd_scalar)(ops_)
            return jax.tree_util.tree_reduce(
                lambda a, g: a + jnp.sum(g.astype(jnp.float32) ** 2), grads,
                0.0)

        operands = (p_sub, xs)
        t_f = scan_time(fwd_scalar, operands, K)
        t_fb = scan_time(fb_scalar, operands, K)
        t_b = t_fb - t_f
        ideal2 = _ideal_ms(name, b)
        rows[name] = {"fwd_ms": round(t_f, 2), "fwd_bwd_ms": round(t_fb, 2),
                      "bwd_ms": round(t_b, 2)}
        tot_f += t_f
        tot_fb += t_fb
        line = (f"| {name} | {t_f:.2f} | {t_fb:.2f} | {t_b:.2f} "
                f"| {t_fb / t_f - 1:.1f}x |")
        if ideal2 is not None:
            bi = 2 * ideal2
            rows[name]["bwd_ideal_ms"] = round(bi, 2)
            rows[name]["bwd_pct_ideal"] = round(100 * bi / t_b) if t_b > 0 else None
            line += f" {bi:.2f} | {100 * bi / max(t_b, 1e-9):.0f}% |"
        else:
            line += " — | — |"
        if args.split_dw_dx:
            # dx: grads w.r.t. the level INPUTS only (params closed over) —
            # the dgrad convs; dw: w.r.t. params only — the wgrad convs. Each
            # includes the forward (jax.grad recomputes it), so dx/dw columns
            # are fwd+that-half; their overlap-free sum exceeds fwd+bwd by
            # one extra forward.
            def dx_scalar(xs_):
                g = jax.grad(lambda xs2: fwd_scalar((p_sub, xs2)))(xs_)
                return jax.tree_util.tree_reduce(
                    lambda a, v: a + jnp.sum(v.astype(jnp.float32) ** 2), g, 0.0)

            def dw_scalar(p_):
                g = jax.grad(lambda p2: fwd_scalar((p2, xs)))(p_)
                return jax.tree_util.tree_reduce(
                    lambda a, v: a + jnp.sum(v.astype(jnp.float32) ** 2), g, 0.0)

            t_dx = scan_time(dx_scalar, xs, K) - t_f
            t_dw = scan_time(dw_scalar, p_sub, K) - t_f
            rows[name]["dx_ms"] = round(t_dx, 2)
            rows[name]["dw_ms"] = round(t_dw, 2)
            line += f" {t_dx:.2f} | {t_dw:.2f} |"
        print(line, flush=True)
    print(f"| **sum** | {tot_f:.2f} | {tot_fb:.2f} | {tot_fb - tot_f:.2f} | |")
    print()
    print(json.dumps({"batch": b, "bf16": not args.f32, "levels": rows}))


if __name__ == "__main__":
    main()
