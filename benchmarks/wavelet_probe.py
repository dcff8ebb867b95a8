"""Wavelet-enhance as pure matmuls (queue 18c probe).

The Haar DWT is separable-linear (cA/cH/cV/cD = Lh@x@Lw^T etc.) and the
cv2-semantics coefficient upsample is linear too, so the g-channel composes
into ONE matmul pair from the raw image ((Au@Lh) @ x @ (Lw^T@Bu^T)) and the
b-channel into two right-mults + four left-mults + magnitude + one upsample
pair. This probe checks exact parity vs ops.wavelet.wavelet_enhance
(pre-quantize values) and times both forms at b128.

Usage: python benchmarks/wavelet_probe.py [--batch 128]
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
from unet_goolenet_tpu.ops.resize import _weight_mat
from unet_goolenet_tpu.ops.wavelet import haar_dwt2, _minmax_u8

RAW_HW = (400, 500)


def haar_mats(n: int, scale: float):
    """L/H (n/2, n) pair-sum / pair-difference matrices. haar_dwt2's bands
    carry an overall 0.5: split as 1.0 on the row axis and 0.5 on the
    column axis (verified numerically in main)."""
    i = jnp.arange(n // 2)
    L = jnp.zeros((n // 2, n), jnp.float32).at[i, 2 * i].set(scale)
    L = L.at[i, 2 * i + 1].set(scale)
    H = jnp.zeros((n // 2, n), jnp.float32).at[i, 2 * i].set(scale)
    H = H.at[i, 2 * i + 1].set(-scale)
    return L, H


def scan_time(fn, base, k=30, iters=3):
    @jax.jit
    def run(base, steps):
        def body(_, i):
            out = fn(base * (1 + 1e-6 * i.astype(base.dtype)))
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
    args = ap.parse_args()
    b = args.batch
    h, w = RAW_HW
    hp = "highest"

    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    gray = jax.random.uniform(key, (b, h, w), jnp.float32, 0.0, 255.0)

    Lh, Hh = haar_mats(h, 1.0)
    Lw, Hw = haar_mats(w, 0.5)
    Au = _weight_mat(h // 2, h, False)
    Bu = _weight_mat(w // 2, w, False)
    MhL = jnp.matmul(Au, Lh, precision=hp)        # (h, h) composed low H-pass
    MwL = jnp.matmul(Bu, Lw, precision=hp).T      # (w, w) composed low W-pass

    # numeric check of the haar matrices vs haar_dwt2 on one image
    x0 = gray[0]
    cA0, (cH0, cV0, cD0) = haar_dwt2(x0)
    em = lambda a, c: float(np.abs(np.asarray(a) - np.asarray(c)).max())
    cA1 = jnp.matmul(jnp.matmul(Lh, x0, precision=hp), Lw.T, precision=hp)
    print("haar cA err:", em(cA1, cA0), flush=True)
    for name, (A_, B_, ref) in {
        "cH": (Hh, Lw, cH0), "cV": (Lh, Hw, cV0), "cD": (Hh, Hw, cD0),
    }.items():
        got = jnp.matmul(jnp.matmul(A_, x0, precision=hp), B_.T, precision=hp)
        e = em(got, ref)
        print(f"haar {name} err: {e}", flush=True)
        if e > 1e-4:
            # convention mismatch (sign/axis swap): report, don't assert —
            # the magnitude sqrt(cH^2+cV^2+cD^2) is invariant to sign and to
            # the cH/cV axis-naming swap
            print(f"  (note: {name} differs — magnitude-invariant if it is "
                  f"a sign/swap)", flush=True)

    def enhance_ref(g):
        return jax.vmap(partial(ops.wavelet_enhance, quantize_uint8=True,
                                channel_first=True))(g)

    def enhance_mm(g):
        # g channel: ONE composed pair
        low_up = jnp.einsum("oh,nhw,wp->nop", MhL, g, MwL, precision=hp)
        # b channel: shared right-mults, then band left-mults
        xl = jnp.einsum("nhw,wp->nhp", g, Lw.T, precision=hp)
        xh = jnp.einsum("nhw,wp->nhp", g, Hw.T, precision=hp)
        cH = jnp.einsum("oh,nhp->nop", Hh, xl, precision=hp)
        cV = jnp.einsum("oh,nhp->nop", Lh, xh, precision=hp)
        cD = jnp.einsum("oh,nhp->nop", Hh, xh, precision=hp)
        high = jnp.sqrt(cH * cH + cV * cV + cD * cD)
        high_up = jnp.einsum("oh,nhp,pw->now", Au, high, Bu.T, precision=hp)
        q = jax.vmap(partial(_minmax_u8, quantize=True))
        return jnp.stack([q(g), q(low_up), q(high_up)], axis=1)

    ref = np.asarray(enhance_ref(gray[:8]))
    got = np.asarray(enhance_mm(gray[:8]))
    err = np.abs(got - ref).max()
    frac = float((got != ref).mean())
    print(f"enhance parity: max abs err {err:.2e}, "
          f"mismatched els {frac:.2e} (quantize boundary flips)", flush=True)

    print("\n| form | ms/batch |")
    print("|---|---|")
    for name, fn in (("wavelet_enhance (vmap, shipped)", enhance_ref),
                     ("wavelet matmul form", enhance_mm)):
        t = scan_time(fn, gray)
        print(f"| {name} | {t*1e3:.2f} |", flush=True)

    # and the pair inside the full preprocess context
    from unet_goolenet_tpu.ops.resize import resize_bilinear

    def pre_ref(g):
        out = resize_bilinear(enhance_ref(g), (224, 224), antialias=True,
                              channel_first=True)
        return out

    def pre_mm(g):
        out = resize_bilinear(enhance_mm(g), (224, 224), antialias=True,
                              channel_first=True)
        return out

    for name, fn in (("full preprocess (shipped path)", pre_ref),
                     ("full preprocess (matmul wavelet)", pre_mm)):
        t = scan_time(fn, gray)
        print(f"| {name} | {t*1e3:.2f} |", flush=True)


if __name__ == "__main__":
    main()
