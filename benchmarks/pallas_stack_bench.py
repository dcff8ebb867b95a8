"""Pallas ConvStack-pair fusion vs XLA at the UNet levels where it fits VMEM.

The qualifying stacks of the 224^2 flagship (whole-image blocks, bf16):
  down2 @56^2 128->256->256, down3 @28^2 256->512->512,
  down4 @14^2 512->512->512, up4.nConvs @28^2 1024->256->256,
  up3.nConvs @56^2 512->128->128.
Timing: one jitted lax.scan over K batches, single scalar fetch (see
memory/axon-tpu-tunnel-rules). Prints a markdown table for RESULTS.md.
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

from unet_goolenet_tpu import ops
from unet_goolenet_tpu.ops import pallas as pk
from unet_goolenet_tpu.ops.pallas.conv import _stack2_fits

LEVELS = [
    ("down2", 56, 128, 256, 256),
    ("down3", 28, 256, 512, 512),
    ("down4", 14, 512, 512, 512),
    ("up4.nConvs", 28, 1024, 256, 256),
    ("up3.nConvs", 56, 512, 128, 128),
]


def timed(fn, *args, iters=5):
    out = jax.jit(fn)
    _ = np.asarray(out(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(out(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--scan-len", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    K, B = args.scan_len, args.batch
    key = jax.random.PRNGKey(0)

    print(f"devices={jax.devices()} batch={B} dtype={dt}")
    print("\n| stack | shape | XLA ms | Pallas ms | speedup |")
    print("|---|---|---|---|---|")
    for name, h, cin, cmid, cout in LEVELS:
        if not _stack2_fits(h, h, cin, cmid, cout, dt.itemsize):
            print(f"| {name} | {h}^2 {cin}->{cmid}->{cout} | - | does not fit | - |")
            continue
        ks = jax.random.split(key, 7)
        x = jax.random.normal(ks[0], (K, B, h, h, cin), dt) * 0.5
        w1 = (jax.random.normal(ks[1], (3, 3, cin, cmid), jnp.float32) * 0.02).astype(dt)
        w2 = (jax.random.normal(ks[2], (3, 3, cmid, cout), jnp.float32) * 0.02).astype(dt)
        s1 = jnp.abs(jax.random.normal(ks[3], (cmid,))) + 0.5
        b1 = jax.random.normal(ks[4], (cmid,)) * 0.1
        s2 = jnp.abs(jax.random.normal(ks[5], (cout,))) + 0.5
        b2 = jax.random.normal(ks[6], (cout,)) * 0.1

        def xla_pair(xs):
            def body(_, xb):
                y = ops.conv2d(xb, w1, None, padding=1)
                y = jax.nn.relu(y * s1 + b1).astype(dt)
                y = ops.conv2d(y, w2, None, padding=1)
                y = jax.nn.relu(y * s2 + b2)
                return _, jnp.sum(y.astype(jnp.float32))
            return jax.lax.scan(body, 0, xs)[1]

        def pallas_pair(xs):
            def body(_, xb):
                y = pk.fused_convstack2(xb, w1, s1, b1, w2, s2, b2)
                return _, jnp.sum(y.astype(jnp.float32))
            return jax.lax.scan(body, 0, xs)[1]

        t_x = timed(xla_pair, x) / K
        try:
            t_p = timed(pallas_pair, x) / K
            # numerics sanity on one batch
            got = pk.fused_convstack2(x[0], w1, s1, b1, w2, s2, b2)
            mid = jax.nn.relu(ops.conv2d(x[0], w1, None, padding=1) * s1 + b1).astype(dt)
            ref = jax.nn.relu(ops.conv2d(mid, w2, None, padding=1) * s2 + b2)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
            flag = "" if err < 0.1 else f" ERR={err:.3f}"
            print(f"| {name} | {h}^2 {cin}->{cmid}->{cout} | {t_x*1e3:.2f} | "
                  f"{t_p*1e3:.2f}{flag} | {t_x/t_p:.2f}x |", flush=True)
        except Exception as e:  # Mosaic lowering can reject; report, don't die
            print(f"| {name} | {h}^2 {cin}->{cmid}->{cout} | {t_x*1e3:.2f} | "
                  f"FAILED {type(e).__name__} | - |", flush=True)


if __name__ == "__main__":
    main()
