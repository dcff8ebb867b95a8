"""Mask -> bounding box -> ROI crop, entirely on-device under static shapes.

Replaces the reference's host-side ROI bridge (分类/util/roi.py:12-51), which moved
the predicted mask to CPU, ran `np.where` for the bbox, sliced the tensor on host and
re-augmented. Here the whole thing is index arithmetic + one bilinear gather inside
the same XLA graph as the two models — zero host round trips (BASELINE.json
north_star).

Semantics locked to the reference:
  * bbox = [min-pad, max+pad] of mask==1 coordinates, clamped to [0, size]
    (roi.py:33-36; note the max side clamps to `size`, exclusive-end).
  * empty mask -> centre fallback crop of side min(h, w)//2 (roi.py:26-31).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mask_to_bbox(
    mask: jax.Array, padding: int = 30
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """(H, W) binary mask -> (y0, y1, x0, x1, is_empty), exclusive-end box.

    Static-shape reduction formulation: row/col `any` reductions, then first/last
    true index via arg-reductions over an index iota.
    """
    h, w = mask.shape
    m = mask.astype(jnp.bool_)
    rows = jnp.any(m, axis=1)  # (H,)
    cols = jnp.any(m, axis=0)  # (W,)
    nonempty = jnp.any(rows)

    yidx = jnp.arange(h, dtype=jnp.int32)
    xidx = jnp.arange(w, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    y_min = jnp.min(jnp.where(rows, yidx, big))
    y_max = jnp.max(jnp.where(rows, yidx, -1))
    x_min = jnp.min(jnp.where(cols, xidx, big))
    x_max = jnp.max(jnp.where(cols, xidx, -1))

    y0 = jnp.maximum(y_min - padding, 0)
    y1 = jnp.minimum(y_max + padding, h)
    x0 = jnp.maximum(x_min - padding, 0)
    x1 = jnp.minimum(x_max + padding, w)

    # Empty-mask centre fallback (roi.py:26-31).
    cy, cx = h // 2, w // 2
    size = min(h, w) // 2
    fy0, fy1 = cy - size // 2, cy + size // 2
    fx0, fx1 = cx - size // 2, cx + size // 2

    y0 = jnp.where(nonempty, y0, fy0).astype(jnp.int32)
    y1 = jnp.where(nonempty, y1, fy1).astype(jnp.int32)
    x0 = jnp.where(nonempty, x0, fx0).astype(jnp.int32)
    x1 = jnp.where(nonempty, x1, fx1).astype(jnp.int32)
    return y0, y1, x0, x1, jnp.logical_not(nonempty)


def crop_and_resize(
    image: jax.Array,
    box: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    out_hw: Tuple[int, int],
) -> jax.Array:
    """Crop (H, W, C) `image` to the dynamic exclusive-end box and bilinearly resize
    to the static `out_hw`.

    Half-pixel-centre bilinear sampling (cv2/`align_corners=False` convention). The
    reference instead slices exactly and PIL-resizes; for the crop sizes here the
    interpolant difference is sub-quantisation-level except on hard edges (SURVEY.md
    §7 'hard parts') — the parity tests compare final masks/top-1, not floats.
    """
    h, w, c = image.shape
    oh, ow = out_hw
    y0, y1, x0, x1 = [b.astype(jnp.float32) for b in box]
    sy = (y1 - y0) / oh
    sx = (x1 - x0) / ow
    # Crop-relative coordinates: sampling never reaches outside the box, and box
    # edges replicate — exactly what slice-then-resize does in the reference.
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * sy - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * sx - 0.5

    def sample_axis(coords, lo, hi):
        # valid relative index range is [0, hi-lo-1]
        last = hi - lo - 1.0
        c0 = jnp.clip(jnp.floor(coords), 0.0, last)
        c1 = jnp.clip(c0 + 1.0, 0.0, last)
        t = jnp.clip(coords - c0, 0.0, 1.0)
        return (c0 + lo).astype(jnp.int32), (c1 + lo).astype(jnp.int32), t

    iy0, iy1, ty = sample_axis(ys, y0, y1)
    ix0, ix1, tx = sample_axis(xs, x0, x1)

    img = image.astype(jnp.float32)
    # Gather rows then columns; XLA lowers these to efficient dynamic-gathers.
    top = img[iy0]  # (oh, W, C)
    bot = img[iy1]
    rows = top + (bot - top) * ty[:, None, None]  # (oh, W, C)
    left = rows[:, ix0]  # (oh, ow, C)
    right = rows[:, ix1]
    out = left + (right - left) * tx[None, :, None]
    return out.astype(image.dtype)


def crop_and_resize_matmul(
    image: jax.Array,
    box: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    out_hw: Tuple[int, int],
) -> jax.Array:
    """`crop_and_resize` as two weight-matrix dots — the MXU form.

    The gather form's column pass gathers along the second-minor dim with a
    3-wide minor (lane-padded 3 -> 128 on TPU); here each axis is one
    (out, src) sparse-in-content dense matmul whose minor dims stay the image
    width / out width. Each weight row holds the same two bilinear taps the
    gather form reads, so values match up to one f32 rounding (the lerp is
    evaluated as w0*v0 + w1*v1 instead of v0 + (v1-v0)*t) —
    tests/test_ops.py::TestCropMatmul.
    """
    h, w, c = image.shape
    oh, ow = out_hw
    y0, y1, x0, x1 = [b.astype(jnp.float32) for b in box]
    sy = (y1 - y0) / oh
    sx = (x1 - x0) / ow
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * sy - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * sx - 0.5

    def wmat(coords, lo, hi, n):
        last = hi - lo - 1.0
        c0 = jnp.clip(jnp.floor(coords), 0.0, last)
        c1 = jnp.clip(c0 + 1.0, 0.0, last)
        t = jnp.clip(coords - c0, 0.0, 1.0)[:, None]
        src = jnp.arange(n, dtype=jnp.float32)[None, :]
        # clamped degenerate taps (c0 == c1) sum to weight 1.0 at that index
        return ((src == (c0 + lo)[:, None]) * (1.0 - t)
                + (src == (c1 + lo)[:, None]) * t)

    wy = wmat(ys, y0, y1, h)                          # (oh, H)
    wx = wmat(xs, x0, x1, w)                          # (ow, W)
    img = image.astype(jnp.float32).reshape(h, w * c)
    rows = (wy @ img).reshape(oh, w, c)               # minor dim w*c
    rows_t = rows.transpose(0, 2, 1).reshape(oh * c, w)
    out = (rows_t @ wx.T).reshape(oh, c, ow)          # minor dim ow
    return out.transpose(0, 2, 1).astype(image.dtype)


def roi_from_mask(
    image: jax.Array,
    mask: jax.Array,
    *,
    padding: int = 30,
    out_hw: Tuple[int, int] = (224, 224),
    matmul: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Full ROI bridge for one image: (H, W, C) image + (H, W) mask ->
    ((oh, ow, C) crop, (4,) int32 box). Batch with jax.vmap.
    matmul=True uses the MXU-form crop (crop_and_resize_matmul)."""
    y0, y1, x0, x1, _ = mask_to_bbox(mask, padding)
    crop_fn = crop_and_resize_matmul if matmul else crop_and_resize
    crop = crop_fn(image, (y0, y1, x0, x1), out_hw)
    return crop, jnp.stack([y0, y1, x0, x1])
