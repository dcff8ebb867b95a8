"""On-device image resizing.

Two semantics are needed for parity with the reference's host pipeline:
  * `resize_bilinear(..., antialias=True)`  — PIL `Image.resize(BILINEAR)` semantics
    (used by torchvision `F.resize`, e.g. 分割/util/data_utils.py:220).
  * `resize_bilinear(..., antialias=False)` — cv2 `INTER_LINEAR` semantics (used by
    `wavelet_enhance`, 分类/ROI_main.py:63,67).
Both use half-pixel centers; they differ only in the antialiasing filter on
downscale. `jax.image.resize` implements exactly these.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(
    x: jax.Array, out_hw: Tuple[int, int], *, antialias: bool = True
) -> jax.Array:
    """Bilinear resize of NHWC (or HWC / HW) images to (oh, ow)."""
    oh, ow = out_hw
    if x.ndim == 4:
        shape = (x.shape[0], oh, ow, x.shape[3])
    elif x.ndim == 3:
        shape = (oh, ow, x.shape[2])
    elif x.ndim == 2:
        shape = (oh, ow)
    else:
        raise ValueError(f"unsupported rank {x.ndim}")
    return jax.image.resize(x, shape, method="linear", antialias=antialias).astype(
        x.dtype
    )


def resize_nearest(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize (mask path, 分割/util/data_utils.py:220-221)."""
    oh, ow = out_hw
    if x.ndim == 4:
        shape = (x.shape[0], oh, ow, x.shape[3])
    elif x.ndim == 3:
        shape = (oh, ow, x.shape[2])
    elif x.ndim == 2:
        shape = (oh, ow)
    else:
        raise ValueError(f"unsupported rank {x.ndim}")
    return jax.image.resize(x, shape, method="nearest")
