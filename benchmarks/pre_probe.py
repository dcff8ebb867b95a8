"""Preprocess decomposition at the official batch (queue 17 support).

preprocess_gray measured 6.7-7.4 ms at b128 vs a ~1.6 ms bandwidth floor
(RESULTS.md queue 16 attribution). This probe splits it: DWT+magnitude,
coefficient upsamples, min-max normalize+quantize, final antialias resize —
each scan-timed at b128 — to find which pass holds the ~5 ms gap.

Usage: python benchmarks/pre_probe.py [--batch 128] [--scan-len 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unet_goolenet_tpu import ops
from unet_goolenet_tpu.ops.wavelet import _minmax_u8, haar_dwt2
from unet_goolenet_tpu.pipeline.two_stage import preprocess_gray

RAW_HW = (400, 500)
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--scan-len", type=int, default=30)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    b, K = args.batch, args.scan_len

    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    gray = jax.random.uniform(key, (b,) + RAW_HW, jnp.float32, 0.0, 255.0)
    h, w = RAW_HW

    def dwt_mag(g):
        def one(x):
            cA, (cH, cV, cD) = haar_dwt2(x)
            return cA, jnp.sqrt(cH * cH + cV * cV + cD * cD)
        return jax.vmap(one)(g)

    cA, high = dwt_mag(gray)

    def upsamples(xs):
        f = lambda c: jax.vmap(partial(ops.resize_bilinear, out_hw=(h, w),
                                       antialias=False))(c)
        return f(xs[0]), f(xs[1])

    low_up, high_up = upsamples((cA, high))

    def minmax3(xs):
        g, lo, hi = xs
        f = jax.vmap(partial(_minmax_u8, quantize=True))
        return jnp.stack([f(g), f(lo), f(hi)], axis=-1)

    stacked = minmax3((gray, low_up, high_up))

    def final_resize(st):
        return jax.vmap(partial(ops.resize_bilinear, out_hw=(SIZE, SIZE),
                                antialias=True))(st)

    rows = [
        ("full preprocess_gray", lambda g: preprocess_gray(
            g, out_hw=(SIZE, SIZE)), gray),
        ("full preprocess_gray (mxu)", lambda g: preprocess_gray(
            g, out_hw=(SIZE, SIZE), mxu_layout=True), gray),
        ("dwt+magnitude", dwt_mag, gray),
        ("coeff upsamples (2x)", upsamples, (cA, high)),
        ("minmax+quantize+stack (3ch)", minmax3, (gray, low_up, high_up)),
        ("final antialias resize", final_resize, stacked),
    ]
    print(f"\n## preprocess decomposition @ b{b} (ms/batch)\n")
    print("| pass | ms |")
    print("|---|---|")
    for name, fn, base in rows:
        t = scan_time(fn, base, K, args.iters)
        print(f"| {name} | {t*1e3:.2f} |", flush=True)


if __name__ == "__main__":
    main()
