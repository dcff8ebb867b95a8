"""Haar wavelet preprocessing, fully on-device.

Re-implements the reference's `wavelet_enhance` (分类/ROI_main.py:37-83, duplicated in
分类/test.py:17-63): a single-level Haar DWT turns a grayscale ultrasound image into a
pseudo-RGB image — R = min-max-normalised gray, G = normalised low-frequency cA
(resized back to full size), B = normalised high-frequency magnitude
sqrt(cH^2 + cV^2 + cD^2) (resized back).

TPU-first design: a level-1 Haar DWT on an even-sized image is a non-overlapping 2x2
block transform, so instead of filter convolutions we lower it to a reshape plus four
fused element-wise ops — pure VPU work that XLA fuses into the surrounding graph. The
reference's host round trip through pywt + cv2 disappears entirely.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from unet_goolenet_tpu.ops.resize import resize_bilinear, resize_bilinear_valid

_SQRT2 = 1.4142135623730951


def haar_dwt2(x: jax.Array) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array]]:
    """Level-1 2D Haar DWT of a (H, W) image -> (cA, (cH, cV, cD)).

    Matches pywt.wavedec2(x, 'haar', level=1) up to coefficient signs (the reference
    only ever squares the detail bands, 分类/ROI_main.py:62, so signs are immaterial).
    Odd dimensions are edge-padded to even (pywt 'symmetric' mode for a length-2
    filter reduces to edge replication).
    """
    h, w = x.shape
    if h % 2:
        x = jnp.concatenate([x, x[-1:, :]], axis=0)
    if w % 2:
        x = jnp.concatenate([x, x[:, -1:]], axis=1)
    h2, w2 = x.shape[0] // 2, x.shape[1] // 2
    blocks = x.reshape(h2, 2, w2, 2)
    a = blocks[:, 0, :, 0]
    b = blocks[:, 0, :, 1]
    c = blocks[:, 1, :, 0]
    d = blocks[:, 1, :, 1]
    cA = (a + b + c + d) * 0.5
    cH = (a + b - c - d) * 0.5  # horizontal detail (vertical difference)
    cV = (a - b + c - d) * 0.5  # vertical detail (horizontal difference)
    cD = (a - b - c + d) * 0.5  # diagonal detail
    return cA, (cH, cV, cD)


def _minmax_u8(x: jax.Array, quantize: bool,
               as_uint8: bool = False) -> jax.Array:
    """Min-max normalise to [0, 1]; optionally round through uint8 levels the way the
    reference does (`(x*255).astype(np.uint8)` then later `/255` in to_tensor).

    as_uint8 (requires quantize) returns the integer level k itself as uint8
    instead of k/255 f32 — 4x less HBM for the wavelet->resize boundary; a
    downstream `astype(f32) / 255.0` reproduces the f32 value BIT-exactly
    (same division, RESULTS.md queue 19 probe: delta 0.0)."""
    lo = jnp.min(x)
    rng = jnp.max(x) - lo
    y = jnp.where(rng > 0, (x - lo) / jnp.maximum(rng, 1e-30), jnp.zeros_like(x))
    if quantize:
        k = jnp.floor(y * 255.0)
        return k.astype(jnp.uint8) if as_uint8 else k / 255.0
    assert not as_uint8, "as_uint8 requires quantize (values must be k/255)"
    return y


def wavelet_enhance(
    gray: jax.Array, *, quantize_uint8: bool = True,
    channel_first: bool = False, out_uint8: bool = False
) -> jax.Array:
    """(H, W) grayscale [0, 255] -> (H, W, 3) pseudo-RGB in [0, 1]
    ((3, H, W) with channel_first=True — the MXU-friendly layout for a
    following separable resize: the contraction minor dim stays W instead of
    the 3-channel stack; see pipeline.preprocess_gray(mxu_layout=True)).

    Parity notes vs 分类/ROI_main.py:37-83:
      * inputs with max <= 1.0 are rescaled by 255 (line 54-55) — caller's job here;
        we accept [0,255] floats.
      * cA and the high-freq magnitude are resized back to (H, W) with cv2
        INTER_LINEAR, i.e. bilinear *without* antialiasing (lines 63, 67).
      * each channel is min-max normalised and quantised through uint8 (lines 70-74);
        `quantize_uint8=False` gives the continuous variant for training throughput.
      * out_uint8=True (requires quantize_uint8) emits the uint8 levels k
        instead of k/255 f32 — the downstream resize dequantizes with the
        identical `/255.0` division, so values are BIT-exact while the
        wavelet->resize HBM boundary shrinks 4x (measured −0.75 ms of the
        5.69 ms preprocess at b128, RESULTS.md queue 19).
    """
    gray = gray.astype(jnp.float32)
    h, w = gray.shape
    cA, (cH, cV, cD) = haar_dwt2(gray)
    high = jnp.sqrt(cH * cH + cV * cV + cD * cD)
    low_up = resize_bilinear(cA, (h, w), antialias=False)
    high_up = resize_bilinear(high, (h, w), antialias=False)
    u8 = out_uint8 and quantize_uint8
    r = _minmax_u8(gray, quantize_uint8, as_uint8=u8)
    g = _minmax_u8(low_up, quantize_uint8, as_uint8=u8)
    b = _minmax_u8(high_up, quantize_uint8, as_uint8=u8)
    return jnp.stack([r, g, b], axis=0 if channel_first else -1)


def _minmax_u8_valid(x: jax.Array, mask: jax.Array, quantize: bool) -> jax.Array:
    """_minmax_u8 with the min/max statistics restricted to the valid region
    (the normalisation itself applies to the whole buffer — out-of-valid
    pixels just shift along and stay edge-like)."""
    lo = jnp.min(jnp.where(mask, x, jnp.inf))
    rng = jnp.max(jnp.where(mask, x, -jnp.inf)) - lo
    y = jnp.where(rng > 0, (x - lo) / jnp.maximum(rng, 1e-30), jnp.zeros_like(x))
    if quantize:
        y = jnp.floor(jnp.clip(y, 0.0, 1.0) * 255.0) / 255.0
    return y


def wavelet_enhance_padded(
    gray: jax.Array, valid_hw, *, quantize_uint8: bool = True,
    channel_first: bool = False
) -> jax.Array:
    """`wavelet_enhance` for an EDGE-padded buffer: the true image is the
    top-left (h, w) = valid_hw (traced scalars) of the even-sized (H, W)
    buffer, and pixels beyond it MUST be edge-replicated (np.pad mode='edge').

    This is the size-bucket serving path (分类/test.py:122-134 over mixed raw
    resolutions): one compiled graph per bucket instead of one per exact
    (H, W). Semantics notes vs the exact path:
      * the level-1 Haar blocks are local, so valid-region coefficients equal
        the exact DWT's; for ODD h/w, the edge-replicated pad row/col
        reproduces pywt's symmetric padding exactly (haar_dwt2's own pad);
      * the coefficient buffers are clamp-gathered to the valid block extent
        before upsampling (pad-region DWT blocks are NOT edge replications of
        the valid coefficients), which makes the boundary taps reproduce the
        exact path's renormalised out-of-range handling: a linear tap past the
        edge with the edge's value gives the same weighted sum resize_bilinear
        gives after dropping+renormalising that tap;
      * cA / high-freq magnitude upsample back to the native (h, w) grid via
        resize_bilinear_valid (dynamic out_valid), matching cv2 INTER_LINEAR
        on the valid region;
      * min-max statistics are restricted to the valid region;
      * outputs beyond (h, w) are edge-replicated-ish values, so a following
        resize_bilinear_valid's boundary kernels behave like the clamped
        border of the exact path.
    """
    gray = gray.astype(jnp.float32)
    hh, ww = gray.shape
    assert hh % 2 == 0 and ww % 2 == 0, "bucket buffers must be even-sized"
    h = jnp.asarray(valid_hw[0], jnp.int32)
    w = jnp.asarray(valid_hw[1], jnp.int32)
    cA, (cH, cV, cD) = haar_dwt2(gray)
    high = jnp.sqrt(cH * cH + cV * cV + cD * cD)
    h2, w2 = (h + 1) // 2, (w + 1) // 2  # pywt ceil for odd dims
    ridx = jnp.minimum(jnp.arange(hh // 2), h2 - 1)
    cidx = jnp.minimum(jnp.arange(ww // 2), w2 - 1)
    cA = cA[ridx][:, cidx]
    high = high[ridx][:, cidx]
    low_up = resize_bilinear_valid(cA, (h2, w2), (hh, ww),
                                   out_valid_hw=(h, w), antialias=False)
    high_up = resize_bilinear_valid(high, (h2, w2), (hh, ww),
                                    out_valid_hw=(h, w), antialias=False)
    # Edge-replicate the region beyond (h, w): out-of-valid sample positions
    # can fall past the coefficient buffer (odd h makes h2 == hh//2 exactly),
    # where scale_and_translate zeroes every tap — a later resize's boundary
    # kernel would read those zeros instead of edge values.
    orid = jnp.minimum(jnp.arange(hh), h - 1)
    ocid = jnp.minimum(jnp.arange(ww), w - 1)
    low_up = low_up[orid][:, ocid]
    high_up = high_up[orid][:, ocid]
    mask = (jnp.arange(hh)[:, None] < h) & (jnp.arange(ww)[None, :] < w)
    r = _minmax_u8_valid(gray, mask, quantize_uint8)
    g = _minmax_u8_valid(low_up, mask, quantize_uint8)
    b = _minmax_u8_valid(high_up, mask, quantize_uint8)
    return jnp.stack([r, g, b], axis=0 if channel_first else -1)
