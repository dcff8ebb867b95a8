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

    # ---- uint8-intermediate variant (VERDICT r4 ask #7) -------------------
    # The quantized wavelet output IS k/255 for integer k: store k as uint8
    # (4x less HBM for the wavelet->resize boundary) and dequantize with the
    # SAME `/ 255.0` f32 division inside the resize fusion — bit-exact values.
    from unet_goolenet_tpu.ops.resize import _weight_mat

    a_h = _weight_mat(h, SIZE, antialias=True)         # (SIZE, h) f32
    a_w = _weight_mat(w, SIZE, antialias=True)         # (SIZE, w) f32

    def _minmax_u8_int(x):
        lo = jnp.min(x)
        rng = jnp.max(x) - lo
        y = jnp.where(rng > 0, (x - lo) / jnp.maximum(rng, 1e-30),
                      jnp.zeros_like(x))
        return jnp.floor(y * 255.0).astype(jnp.uint8)

    def wavelet_u8_nchw(g):
        def one(x):
            cA, (cH, cV, cD) = haar_dwt2(x)
            hi = jnp.sqrt(cH * cH + cV * cV + cD * cD)
            lo_up = ops.resize_bilinear(cA, (h, w), antialias=False)
            hi_up = ops.resize_bilinear(hi, (h, w), antialias=False)
            return jnp.stack([_minmax_u8_int(x), _minmax_u8_int(lo_up),
                              _minmax_u8_int(hi_up)], axis=0)
        return jax.vmap(one)(g)

    def full_u8(g):
        u8 = wavelet_u8_nchw(g)                        # (b, 3, h, w) uint8
        xf = u8.astype(jnp.float32) / 255.0            # exact k/255 dequant
        xh = jnp.einsum("oh,nchw->ncow", a_h, xf, precision="highest")
        out = jnp.einsum("pw,ncow->ncop", a_w, xh, precision="highest")
        return jnp.moveaxis(out, 1, -1)

    # ---- fold-minmax variant (parity-breaking bound probe) ----------------
    # min-max normalise AFTER the antialias resize (resize is linear and its
    # rows sum to 1, so (x-lo)/rng commutes) — skips the full-res normalise
    # pass AND the uint8 quantization (NOT reference parity: the reference
    # quantizes before PIL; fast_resize class).
    def full_fold(g):
        def one(x):
            cA, (cH, cV, cD) = haar_dwt2(x)
            hi = jnp.sqrt(cH * cH + cV * cV + cD * cD)
            lo_up = ops.resize_bilinear(cA, (h, w), antialias=False)
            hi_up = ops.resize_bilinear(hi, (h, w), antialias=False)
            st = jnp.stack([x, lo_up, hi_up], axis=0)   # (3, h, w)
            lo = jnp.min(st, axis=(1, 2))
            rng = jnp.maximum(jnp.max(st, axis=(1, 2)) - lo, 1e-30)
            return st, lo, rng
        st, lo, rng = jax.vmap(one)(g)                  # (b,3,h,w)
        xh = jnp.einsum("oh,nchw->ncow", a_h, st, precision="highest")
        out = jnp.einsum("pw,ncow->ncop", a_w, xh, precision="highest")
        out = (out - lo[:, :, None, None]) / rng[:, :, None, None]
        return jnp.moveaxis(out, 1, -1)

    rows = [
        ("full preprocess_gray", lambda g: preprocess_gray(
            g, out_hw=(SIZE, SIZE)), gray),
        ("full preprocess_gray (mxu)", lambda g: preprocess_gray(
            g, out_hw=(SIZE, SIZE), mxu_layout=True), gray),
        ("dwt+magnitude", dwt_mag, gray),
        ("coeff upsamples (2x)", upsamples, (cA, high)),
        ("minmax+quantize+stack (3ch)", minmax3, (gray, low_up, high_up)),
        ("final antialias resize", final_resize, stacked),
        ("FULL u8-intermediate (exact)", full_u8, gray),
        ("FULL fold-minmax (no-parity)", full_fold, gray),
    ]
    print(f"\n## preprocess decomposition @ b{b} (ms/batch)\n")
    print("| pass | ms |")
    print("|---|---|")
    for name, fn, base in rows:
        t = scan_time(fn, base, K, args.iters)
        print(f"| {name} | {t*1e3:.2f} |", flush=True)

    # parity: u8-intermediate must be BIT-exact vs the shipped mxu path
    ref = jax.jit(lambda g: preprocess_gray(g, out_hw=(SIZE, SIZE),
                                            mxu_layout=True))(gray[:8])
    got = jax.jit(full_u8)(gray[:8])
    derr = float(jnp.max(jnp.abs(ref - got)))
    print(f"\nu8-intermediate max |delta| vs shipped mxu path: {derr:.2e} "
          f"(must be 0.0 for exact parity)", flush=True)


if __name__ == "__main__":
    main()
