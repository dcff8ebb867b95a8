"""Pooling ops (NHWC).

Covers the reference's pooling surface (SURVEY.md §2.3): maxpool 2x2 (UNet DownBlock,
分割/nets/basicUnet.py:47), 3x3/s2 ceil-mode maxpool (GoogLeNet stem), adaptive
avg/max pool to 1x1 (CoordAtt3, 分割/nets/basicUnet.py:206-207), and GoogLeNet's
global average pool.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _ceil_pad(size: int, k: int, s: int) -> int:
    """Extra trailing pad so that reduce_window covers a ceil-mode window count."""
    import math

    out = math.ceil((size - k) / s) + 1
    needed = (out - 1) * s + k
    return max(0, needed - size)


def _pool2x2_raw(x: jax.Array) -> jax.Array:
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID")


@jax.custom_vjp
def max_pool2x2(x: jax.Array) -> jax.Array:
    """2x2/s2 max pool (NHWC, even H/W, float) with a fast TPU backward.

    XLA's adjoint of reduce-window-max is SelectAndScatter — a windowed
    scatter that resists fusion on TPU and dominated the train-step backward
    (benchmarks/bwd_profile.py). This custom VJP recomputes the routing as
    pure elementwise masks over a (N,H/2,2,W/2,2,C) view: grad goes to the
    FIRST window element equal to the max, in window scan order
    (r0c0, r0c1, r1c0, r1c1) — torch's tie rule, and the same element
    SelectAndScatter's GE-select picks, so grads match the XLA adjoint
    bit-for-bit (tests/test_ops.py). Reference pool: 分割/nets/basicUnet.py:47.
    """
    return _pool2x2_raw(x)


def _mp2x2_fwd(x):
    y = _pool2x2_raw(x)
    return y, (x, y)


def _mp2x2_bwd(res, g):
    x, y = res
    n, h2, w2, c = y.shape
    v = x.reshape(n, h2, 2, w2, 2, c)
    yb = y[:, :, None, :, None, :]
    eq = v == yb
    e00, e01 = eq[:, :, 0, :, 0], eq[:, :, 0, :, 1]
    e10, e11 = eq[:, :, 1, :, 0], eq[:, :, 1, :, 1]
    m01 = e01 & ~e00
    m10 = e10 & ~(e00 | e01)
    m11 = e11 & ~(e00 | e01 | e10)
    z = jnp.zeros_like(g)
    top = jnp.stack([jnp.where(e00, g, z), jnp.where(m01, g, z)], axis=3)
    bot = jnp.stack([jnp.where(m10, g, z), jnp.where(m11, g, z)], axis=3)
    return (jnp.stack([top, bot], axis=2).reshape(x.shape),)


max_pool2x2.defvjp(_mp2x2_fwd, _mp2x2_bwd)


def max_pool2d(
    x: jax.Array,
    window: Union[int, Sequence[int]] = 2,
    stride: Union[int, Sequence[int], None] = None,
    *,
    padding: Union[int, Sequence[Tuple[int, int]]] = 0,
    ceil_mode: bool = False,
) -> jax.Array:
    kh, kw = _pair(window)
    sh, sw = _pair(stride) if stride is not None else (kh, kw)
    if isinstance(padding, int):
        pads = [(padding, padding), (padding, padding)]
    else:
        pads = list(padding)
    if ceil_mode:
        n, h, w, c = x.shape
        pads = [
            (pads[0][0], pads[0][1] + _ceil_pad(h + pads[0][0] + pads[0][1], kh, sh)),
            (pads[1][0], pads[1][1] + _ceil_pad(w + pads[1][0] + pads[1][1], kw, sw)),
        ]
    if ((kh, kw, sh, sw) == (2, 2, 2, 2) and not any(p for pr in pads for p in pr)
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and jnp.issubdtype(x.dtype, jnp.floating)):
        return max_pool2x2(x)
    # -inf (not finfo.min) so JAX recognises the differentiable reduce-window-max
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=[(0, 0), pads[0], pads[1], (0, 0)],
    )


def avg_pool2d(
    x: jax.Array,
    window: Union[int, Sequence[int]] = 2,
    stride: Union[int, Sequence[int], None] = None,
    *,
    padding: int = 0,
    count_include_pad: bool = True,
) -> jax.Array:
    kh, kw = _pair(window)
    sh, sw = _pair(stride) if stride is not None else (kh, kw)
    pads = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    summed = lax.reduce_window(
        x,
        jnp.array(0, x.dtype),
        lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=pads,
    )
    if count_include_pad or padding == 0:
        return summed / (kh * kw)
    ones = jnp.ones_like(x)
    counts = lax.reduce_window(
        ones,
        jnp.array(0, x.dtype),
        lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=pads,
    )
    return summed / counts


def global_avg_pool(x: jax.Array, keepdims: bool = False) -> jax.Array:
    """Adaptive average pool to 1x1 (reference: nn.AdaptiveAvgPool2d((1,1)))."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def global_max_pool(x: jax.Array, keepdims: bool = False) -> jax.Array:
    return jnp.max(x, axis=(1, 2), keepdims=keepdims)


def adaptive_avg_pool(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """PyTorch-style adaptive average pooling to an arbitrary (oh, ow).

    Used by CoordAtt (分割/nets/basicUnet.py:87-91, pools to (h,1)/(1,w)) and the
    GoogLeNet aux heads (4x4). Matches torch's semantics: window i spans
    [floor(i*S/O), ceil((i+1)*S/O)).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw

    def pool_axis(arr, size, out, axis):
        if size == out:
            return arr
        if size % out == 0:
            k = size // out
            shape = list(arr.shape)
            shape[axis : axis + 1] = [out, k]
            return jnp.mean(arr.reshape(shape), axis=axis + 1)
        # General case: build the (out, size) averaging matrix once (static shapes).
        import numpy as np

        m = np.zeros((out, size), dtype=np.float32)
        for i in range(out):
            s = (i * size) // out
            e = -(-((i + 1) * size) // out)  # ceil
            m[i, s:e] = 1.0 / (e - s)
        mat = jnp.asarray(m, dtype=arr.dtype)
        moved = jnp.moveaxis(arr, axis, -1)
        pooled = jnp.einsum("...s,os->...o", moved, mat)
        return jnp.moveaxis(pooled, -1, axis)

    y = pool_axis(x, h, oh, 1)
    y = pool_axis(y, w, ow, 2)
    return y
