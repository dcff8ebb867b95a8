"""Resize-form A/B at b128 (queue 18): the final antialias resize runs at
~7-15% MXU via jax.image.resize (3.63 ms of the 6.53 ms preprocess,
RESULTS.md queue 17). Same math, three schedules:

  jax.image      the shipped form (batched gather into two tensordots)
  einsum         explicit separable einsum with identity-derived weight
                 matrices (A = resize(eye) — bit-identical weights by
                 construction/linearity)
  fold           explicit ONE-giant-dot-per-axis form: transpose/reshape so
                 the batch rides the non-contracted dim (M=224 K=400
                 N=N*3*500, then M=N*3*224 K=500 N=224)

Parity asserted on-device (<= 1e-5 abs vs jax.image) before timing.

Usage: python benchmarks/resize_probe.py [--batch 128]
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

RAW_HW = (400, 500)
SIZE = 224


def weight_mat(n_in: int, n_out: int, antialias: bool) -> jax.Array:
    """(n_out, n_in) separable resize weights — exactly jax.image.resize's,
    extracted by resizing the identity (resize is linear per axis)."""
    eye = jnp.eye(n_in, dtype=jnp.float32)
    return jax.image.resize(eye, (n_out, n_in), method="linear",
                            antialias=antialias)


def scan_time(fn, base, k=30, iters=3):
    @jax.jit
    def run(base, steps):
        def body(_, i):
            out = fn(base * (1 + 1e-6 * i.astype(base.dtype)))
            return _, jnp.sum(out.astype(jnp.float32))

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
    args = ap.parse_args()
    b = args.batch
    h, w = RAW_HW

    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (b, 3, h, w), jnp.float32, 0.0, 1.0)  # NCHW
    A = weight_mat(h, SIZE, True)    # (224, 400)
    B = weight_mat(w, SIZE, True)    # (224, 500)

    def via_jax_image(x):
        return jax.image.resize(x, (b, 3, SIZE, SIZE), method="linear",
                                antialias=True)

    def via_einsum(x, prec="highest"):
        xh = jnp.einsum("oh,nchw->ncow", A, x, precision=prec)
        return jnp.einsum("pw,ncow->ncop", B, xh, precision=prec)

    def via_fold(x, prec="highest"):
        # H pass: one dot (224, 400) @ (400, N*3*W)
        xt = x.transpose(2, 0, 1, 3).reshape(h, b * 3 * w)
        xh = jnp.matmul(A, xt, precision=prec).reshape(SIZE, b, 3, w)
        # W pass: one dot (N*3*224, 500) @ (500, 224)
        xw = xh.transpose(1, 2, 0, 3).reshape(b * 3 * SIZE, w)
        return jnp.matmul(xw, B.T, precision=prec).reshape(b, 3, SIZE, SIZE)

    ref = np.asarray(via_jax_image(x))
    for name, fn in (("einsum", via_einsum), ("fold", via_fold)):
        got = np.asarray(fn(x))
        err = np.abs(got - ref).max()
        print(f"parity {name}: max abs err {err:.2e}", flush=True)
        assert err <= 1e-5, name

    print(f"\n## antialias 400x500 -> 224^2 resize forms @ b{b} NCHW f32 "
          f"(ms/batch)\n")
    print("| form | ms |")
    print("|---|---|")
    for name, fn in (("jax.image.resize", via_jax_image),
                     ("einsum", via_einsum), ("fold", via_fold),
                     ("einsum bf16-prec (parity ~5e-3)",
                      lambda v: via_einsum(v, "default")),
                     ("fold bf16-prec (parity ~5e-3)",
                      lambda v: via_fold(v, "default"))):
        t = scan_time(fn, x)
        print(f"| {name} | {t*1e3:.2f} |", flush=True)

    # the cv2-semantics upsample pair from wavelet_enhance, batched
    cA = jax.random.uniform(key, (b, h // 2, w // 2), jnp.float32)
    Au = weight_mat(h // 2, h, False)
    Bu = weight_mat(w // 2, w, False)

    def up_jax_image(c):
        return jax.image.resize(c, (b, h, w), method="linear",
                                antialias=False)

    def up_fold(c, prec="highest"):
        ct = c.transpose(1, 0, 2).reshape(h // 2, b * (w // 2))
        xh = jnp.matmul(Au, ct, precision=prec).reshape(h, b, w // 2)
        xw = xh.transpose(1, 0, 2).reshape(b * h, w // 2)
        return jnp.matmul(xw, Bu.T, precision=prec).reshape(b, h, w)

    got = np.asarray(up_fold(cA))
    err = np.abs(got - np.asarray(up_jax_image(cA))).max()
    print(f"\nparity up_fold: max abs err {err:.2e}", flush=True)
    assert err <= 1e-5
    def up_einsum(c, prec="highest"):
        xh = jnp.einsum("oh,nhw->now", Au, c, precision=prec)
        return jnp.einsum("pw,now->nop", Bu, xh, precision=prec)

    err = np.abs(np.asarray(up_einsum(cA)) -
                 np.asarray(up_jax_image(cA))).max()
    print(f"parity up_einsum: max abs err {err:.2e}", flush=True)
    assert err <= 1e-5
    for name, fn in (("upsample jax.image", up_jax_image),
                     ("upsample fold", up_fold),
                     ("upsample einsum", up_einsum)):
        t = scan_time(fn, cA)
        print(f"| {name} | {t*1e3:.2f} |", flush=True)


if __name__ == "__main__":
    main()
