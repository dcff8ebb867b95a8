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


def roi_from_mask(
    image: jax.Array,
    mask: jax.Array,
    *,
    padding: int = 30,
    out_hw: Tuple[int, int] = (224, 224),
) -> Tuple[jax.Array, jax.Array]:
    """Full ROI bridge for one image: (H, W, C) image + (H, W) mask ->
    ((oh, ow, C) crop, (4,) int32 box). Batch with jax.vmap."""
    y0, y1, x0, x1, _ = mask_to_bbox(mask, padding)
    crop = crop_and_resize(image, (y0, y1, x0, x1), out_hw)
    return crop, jnp.stack([y0, y1, x0, x1])
