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


def _weight_mat(n_in: int, n_out: int, antialias: bool) -> jax.Array:
    """(n_out, n_in) separable resize weight matrix — exactly
    jax.image.resize's per-axis weights, extracted by resizing the identity
    (the per-axis resize is linear). Constant-folded at compile time for
    static shapes."""
    eye = jnp.eye(n_in, dtype=jnp.float32)
    return jax.image.resize(eye, (n_out, n_in), method="linear",
                            antialias=antialias)


def resize_bilinear(
    x: jax.Array, out_hw: Tuple[int, int], *, antialias: bool = True,
    channel_first: bool = False, precision: str = "highest"
) -> jax.Array:
    """Bilinear resize of NHWC (or HWC / HW) images to (oh, ow).

    channel_first=True treats rank-4 input as NCHW / rank-3 as CHW — the
    MXU-friendly layout on TPU: the separable resize runs as two explicit
    f32 einsum contractions against identity-derived weight matrices (same
    values as jax.image.resize to float noise — the weights ARE
    jax.image.resize's, see _weight_mat; precision='highest' keeps the f32
    semantics on TPU). Measured 2.87 vs 3.87 ms at b128 400x500->224^2 for
    the batched-gather schedule jax.image.resize picks on TPU
    (benchmarks/resize_probe.py, RESULTS.md queue 18).

    precision applies to the einsum path only: "highest" (default) keeps
    exact f32 reference semantics; "default" lets the MXU run the dots at
    bf16 input precision — 1.35 vs 2.87 ms at b128, value delta ~5e-3 on
    [0,1] images (~1 uint8 quantization level; opt-in via
    TwoStagePipeline(fast_resize=True), NOT reference parity)."""
    oh, ow = out_hw
    if x.ndim == 4 and channel_first:
        a = _weight_mat(x.shape[2], oh, antialias)
        bm = _weight_mat(x.shape[3], ow, antialias)
        if x.dtype == jnp.uint8:
            # quantized-uint8 input (wavelet_enhance out_uint8=True): the
            # stored level k dequantizes with the SAME `/ 255.0` division the
            # f32 path used, so values are BIT-exact while the input read is
            # 4x smaller (RESULTS.md queue 19: preprocess 5.69 -> 4.94 ms at
            # b128). Output stays f32 (there is no uint8 output semantics).
            xf = x.astype(jnp.float32) / 255.0
        else:
            xf = x.astype(jnp.float32)
        xh = jnp.einsum("oh,nchw->ncow", a, xf, precision=precision)
        out = jnp.einsum("pw,ncow->ncop", bm, xh, precision=precision)
        return out if x.dtype == jnp.uint8 else out.astype(x.dtype)
    if x.ndim == 4:
        shape = (x.shape[0], oh, ow, x.shape[3])
    elif x.ndim == 3:
        shape = (x.shape[0], oh, ow) if channel_first else (oh, ow, x.shape[2])
    elif x.ndim == 2:
        shape = (oh, ow)
    else:
        raise ValueError(f"unsupported rank {x.ndim}")
    return jax.image.resize(x, shape, method="linear", antialias=antialias).astype(
        x.dtype
    )


def resize_bilinear_valid(
    x: jax.Array,
    in_valid_hw,
    out_hw: Tuple[int, int],
    *,
    out_valid_hw=None,
    antialias: bool = True,
    channel_first: bool = False,
) -> jax.Array:
    """Bilinear resize of the top-left VALID region of a (possibly padded)
    HW / HWC buffer, with the valid extents as TRACED scalars.

    The size-bucket serving path (分类/test.py:122-134 batched over mixed raw
    resolutions) pads each image to a shared bucket buffer so one compiled
    graph covers many native sizes; this op anchors the interpolation grid to
    the valid extent instead of the buffer extent:

        sample position of output pixel i = (i + 0.5) * h_in / h_out - 0.5

    exactly `jax.image.resize`'s grid for an (h_in, w_in) image, so the result
    over the valid output region matches the unpadded resize bit-for-bit apart
    from boundary kernels that touch padded pixels — which edge-replicated
    padding (np.pad mode='edge') makes match the clamped border handling
    (tests/test_ops.py::TestResizeValid).

    in_valid_hw: (h, w) traced scalars — the valid extent of `x`.
    out_hw: STATIC output buffer shape.
    out_valid_hw: traced valid extent of the output grid; defaults to out_hw.
      (Used by wavelet_enhance_padded to upsample DWT bands to the dynamic
      native size inside a static buffer; output pixels beyond it are
      extrapolation garbage the caller must mask or ignore.)
    """
    oh, ow = out_hw
    h_in = jnp.asarray(in_valid_hw[0], jnp.float32)
    w_in = jnp.asarray(in_valid_hw[1], jnp.float32)
    if out_valid_hw is None:
        h_out, w_out = jnp.float32(oh), jnp.float32(ow)
    else:
        h_out = jnp.asarray(out_valid_hw[0], jnp.float32)
        w_out = jnp.asarray(out_valid_hw[1], jnp.float32)
    scale = jnp.stack([h_out / h_in, w_out / w_in])
    spatial = (0, 1)
    if x.ndim == 3:
        if channel_first:
            shape, spatial = (x.shape[0], oh, ow), (1, 2)
        else:
            shape = (oh, ow, x.shape[2])
    elif x.ndim == 2:
        shape = (oh, ow)
    else:
        raise ValueError(f"unsupported rank {x.ndim}")
    return jax.image.scale_and_translate(
        x, shape, spatial, scale.astype(x.dtype), jnp.zeros(2, x.dtype),
        "linear", antialias=antialias,
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
