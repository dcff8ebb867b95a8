"""Convolution ops (NHWC / HWIO).

TPU-first notes:
  * NHWC with HWIO weights is the layout XLA:TPU tiles best onto the MXU.
  * BatchNorm in inference mode is folded into the conv (scale/bias epilogue) so the
    whole ConvBatchNorm block (reference: 分割/nets/basicUnet.py:25-40) compiles to a
    single MXU op with a fused vector epilogue.
  * Accumulation is always f32 (`preferred_element_type`), activations may be bf16.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

DIMS = ("NHWC", "HWIO", "NHWC")


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)  # type: ignore[return-value]


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: Union[int, Sequence[int]] = 1,
    padding: Union[str, int, Sequence[Tuple[int, int]]] = 0,
    feature_group_count: int = 1,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """2D convolution, x: (N,H,W,Cin), w: (kh,kw,Cin,Cout)."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=_pair(stride),
        padding=padding,
        dimension_numbers=DIMS,
        feature_group_count=feature_group_count,
        preferred_element_type=accum_dtype,
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def conv_transpose2x2(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """Transposed conv, kernel 2x2, stride 2 (the UNet upsampler,
    reference: 分割/nets/basicUnet.py:121).

    x: (N,H,W,Cin), w: (2,2,Cin,Cout) -> (N,2H,2W,Cout).

    With kernel == stride there is no output overlap, so this is equivalent to a
    per-pixel (Cin -> 4*Cout) matmul followed by a depth-to-space reshape — which is
    exactly how we lower it: one big MXU matmul instead of a scatter-style transposed
    conv, the efficient formulation on TPU.
    """
    n, h, wi, cin = x.shape
    kh, kw, _, cout = w.shape
    assert (kh, kw) == (2, 2), "specialised for the 2x2/s2 UNet upsampler"
    # (Cin, 2*2*Cout): columns ordered (kh, kw, cout)
    wmat = w.transpose(2, 0, 1, 3).reshape(cin, 4 * cout)
    y = jnp.dot(x.reshape(-1, cin), wmat, preferred_element_type=accum_dtype)
    y = y.reshape(n, h, wi, 2, 2, cout)
    # depth-to-space: (N,H,2,W,2,C) -> (N,2H,2W,C)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * wi, cout)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def fold_batchnorm(
    w: jax.Array,
    b: Optional[jax.Array],
    gamma: jax.Array,
    beta: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float = 1e-5,
) -> Tuple[jax.Array, jax.Array]:
    """Fold inference-mode BatchNorm into conv weights: returns (w', b') such that
    conv(x, w') + b' == BN(conv(x, w) + b)."""
    inv = gamma * lax.rsqrt(var + eps)
    w_f = w * inv  # broadcast over (kh,kw,cin,cout) last axis
    b0 = b if b is not None else 0.0
    b_f = (b0 - mean) * inv + beta
    return w_f.astype(w.dtype), b_f.astype(w.dtype)


def conv2d_bn_act(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array],
    gamma: jax.Array,
    beta: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    *,
    stride: Union[int, Sequence[int]] = 1,
    padding: Union[str, int] = 1,
    eps: float = 1e-5,
    act: Optional[str] = "relu",
) -> jax.Array:
    """Inference-mode fused conv+BN+activation (BN folded into the conv)."""
    w_f, b_f = fold_batchnorm(w, b, gamma, beta, mean, var, eps)
    y = conv2d(x, w_f, b_f, stride=stride, padding=padding)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "sigmoid":
        y = jax.nn.sigmoid(y)
    elif act is not None:
        raise ValueError(f"unknown activation {act!r}")
    return y
