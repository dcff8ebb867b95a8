"""Stage-A probe for the fused-train-up1 decision (VERDICT r3 ask #4).

The train-mode packed up1 forward costs ~3x the serving packed-XLA up1
(0.84 vs 0.27 ms/img at b8, RESULTS.md queues 7/9). Before writing any
train-mode Pallas kernel, this probe measures WHERE that 3x goes, per piece,
at the 224^2/64ch packed level:

  conv            raw packed conv3x3 (the FLOPs floor)
  conv+stats      + per-channel batch sum/sumsq (what a stats-fused kernel
                  would emit)
  cbn_train       the full train CBN (_cbn_t: conv + batch-stat BN + relu)
  up1_train       the whole train level (_up_alig_p_t)
  up1_serving     the whole serving level (_up_alig_p, BN folded)
  up1_fused_serv  the serving fused Pallas tail (cost model UPPER BOUND for
                  any train twin: a real one adds stat passes)

If (cbn_train - conv+stats) is small, XLA already fuses the BN-train extras
and a kernel can only win what up1_fused_serv shows; if it is large, a
stats-deferred kernel chain has that much headroom on top.

Usage: python benchmarks/cbn_train_probe.py [--batch 8 16] [--scan-len 30]
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

from unet_goolenet_tpu.models import UNetTaskAligWeight
from unet_goolenet_tpu.ops import packed as P
from unet_goolenet_tpu.pipeline import engine, engine_train

SIZE = 224


def scan_time(fn, base, k, iters=3):
    @jax.jit
    def run(base, steps):
        def body(_, i):
            x = jax.tree_util.tree_map(
                lambda b2: b2 * (1 + 1e-6 * i.astype(b2.dtype)), base)
            out = fn(x)
            return _, jax.tree_util.tree_reduce(
                lambda a, o: a + jnp.sum(o.astype(jnp.float32)), out, 0.0)

        _, outs = jax.lax.scan(body, 0, steps)
        return outs

    steps = jnp.arange(k)
    _ = np.asarray(run(base, steps))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(run(base, steps))
        best = min(best, time.perf_counter() - t0)
    return best / k


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--scan-len", type=int, default=30)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    K = args.scan_len

    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    model = UNetTaskAligWeight(n_classes=1, dtype=dtype)
    uv = model.init({"params": key}, jnp.zeros((1, SIZE, SIZE, 3)),
                    train=False)
    p, s = uv["params"], uv["batch_stats"]
    u, us = p["up1"], s["up1"]
    blk = u["nConvs"]["block1"]          # 3x3 64->64 conv + BN params
    sblk = us["nConvs"]["block1"]
    w_exp = P.expand_weights_pp(
        blk["conv"]["conv"]["kernel"]).astype(dtype)
    bias = blk["conv"]["conv"]["bias"].astype(dtype)

    for b in args.batch:
        print(f"\n## packed 224^2/64ch train-CBN probe @ batch {b} "
              f"(bf16, ms/batch)\n")
        print("| piece | ms |")
        print("|---|---|")
        x_p = jax.random.uniform(key, (b, SIZE, SIZE // 2, 128),
                                 jnp.float32).astype(dtype)
        y_p = jax.random.uniform(key, (b, SIZE // 2, SIZE // 4, 128),
                                 jnp.float32).astype(dtype)

        def conv_raw(x):
            return P.conv3x3_pp(x, w_exp, bias, accum=dtype)

        def conv_stats(x):
            raw = P.conv3x3_pp(x, w_exp, bias, accum=dtype)
            r32 = raw.astype(jnp.float32).reshape(raw.shape[:-1] + (2, 64))
            red = (0, 1, 2, 3)
            return raw, jnp.sum(r32, red), jnp.sum(r32 * r32, red)

        def cbn_train(x):
            return engine_train._cbn_t(x, blk, sblk, packed=True)

        def up1_train(xs):
            return engine_train._up_alig_p_t(xs[1], xs[0], u, us)

        def up1_serving(xs):
            return engine._up_alig_p(xs[1], xs[0], u, us, dtype)

        def up1_fused_serving(xs):
            return engine.unet_forward_packed_tail_fused(uv, xs[1], xs[0],
                                                         dtype)

        for name, fn, base in (
                ("conv", conv_raw, x_p), ("conv+stats", conv_stats, x_p),
                ("cbn_train", cbn_train, x_p),
                ("up1_train", up1_train, (x_p, y_p)),
                ("up1_serving", up1_serving, (x_p, y_p)),
                ("up1_fused_serv", up1_fused_serving, (x_p, y_p))):
            try:
                t = scan_time(fn, base, K, args.iters)
                print(f"| {name} | {t*1e3:.2f} |", flush=True)
            except Exception as e:  # pragma: no cover - chip guard
                print(f"| {name} | FAILED {type(e).__name__} |", flush=True)
        del x_p, y_p


if __name__ == "__main__":
    main()
