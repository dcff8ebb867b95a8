"""UNet model family (reference: 分割/nets/basicUnet.py:133-437), NHWC.

All variants share the 4-down/4-up, 64-base-channel trunk:
    inc 3->64, down1 64->128, down2 128->256, down3 256->512, down4 512->512,
    up4 (1024)->256, up3 (512)->128, up2 (256)->64, up1 (128)->64, 1x1 head.

* UNetBasic          — plain UpBlocks, extra (avgpool->fc1->fc2) scalar head.
* UNetTask           — + TransformerDecoder bottleneck; returns (logits, cl_out).
* UNetTaskAlig       — + CoordAtt3-gated skips (UpBlockAlig); returns both heads.
* UNetTaskAligWeight — the flagship / production segmentation model
  (basicUnet.py:369-437): gated skips + transformer bottleneck, segmentation logits
  only. The reference also declares fc1/fc2/avgpool it never calls — we don't; the
  checkpoint converter drops those weights.

Inputs are NHWC float; outputs are NHWC logits (n, H, W, n_classes).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from unet_goolenet_tpu.nn.blocks import (
    ConvBatchNorm,
    DownBlock,
    UpBlock,
    UpBlockAlig,
    TorchConv,
)
from unet_goolenet_tpu.nn.transformer import TransformerDecoder
from unet_goolenet_tpu.nn.init import torch_linear_init, torch_bias_init

Dtype = Any
BASE = 64


class _Trunk(nn.Module):
    """Shared encoder; returns the five feature maps."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = BASE
        x1 = ConvBatchNorm(c, dtype=self.dtype, name="inc")(x, train=train)
        x2 = DownBlock(c * 2, dtype=self.dtype, name="down1")(x1, train=train)
        x3 = DownBlock(c * 4, dtype=self.dtype, name="down2")(x2, train=train)
        x4 = DownBlock(c * 8, dtype=self.dtype, name="down3")(x3, train=train)
        x5 = DownBlock(c * 8, dtype=self.dtype, name="down4")(x4, train=train)
        return x1, x2, x3, x4, x5


def _head_1x1(n_classes: int, dtype, name: str = "outc"):
    return TorchConv(n_classes, (1, 1), dtype=dtype, name=name)


def _cls_head(feat: jax.Array, dtype) -> jax.Array:
    """avgpool(1x1) -> fc(512->256) -> fc(256->1) (basicUnet.py:157-196)."""
    pooled = jnp.mean(feat, axis=(1, 2))  # (N, C)
    c = pooled.shape[-1]
    fc1 = nn.Dense(c // 2, kernel_init=torch_linear_init,
                   bias_init=torch_bias_init(c), dtype=dtype, name="fc1")
    fc2 = nn.Dense(1, kernel_init=torch_linear_init,
                   bias_init=torch_bias_init(c // 2), dtype=dtype, name="fc2")
    return fc2(fc1(pooled))


class UNetBasic(nn.Module):
    """basicUnet.py:133-200 — plain UNet with dual (seg, scalar-cls) heads."""

    n_classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        x = x.astype(self.dtype)
        x1, x2, x3, x4, x5 = _Trunk(dtype=self.dtype, name="trunk")(x, train=train)
        cl_out = _cls_head(x5, self.dtype)
        y = UpBlock(BASE * 4, dtype=self.dtype, name="up4")(x5, x4, train=train)
        y = UpBlock(BASE * 2, dtype=self.dtype, name="up3")(y, x3, train=train)
        y = UpBlock(BASE, dtype=self.dtype, name="up2")(y, x2, train=train)
        y = UpBlock(BASE, dtype=self.dtype, name="up1")(y, x1, train=train)
        logits = _head_1x1(self.n_classes, self.dtype)(y)
        return logits, cl_out


class UNetTask(nn.Module):
    """basicUnet.py:237-304 — UNetBasic + transformer bottleneck."""

    n_classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        x = x.astype(self.dtype)
        x1, x2, x3, x4, x5 = _Trunk(dtype=self.dtype, name="trunk")(x, train=train)
        cl_feat, x5 = TransformerDecoder(
            dim=BASE * 8, depth=1, heads=8, dim_head=64, mlp_dim=2048,
            pos_size=x5.shape[1], dtype=self.dtype, name="task2",
        )(x5, x5, train=train)
        cl_out = _cls_head(cl_feat, self.dtype)
        y = UpBlock(BASE * 4, dtype=self.dtype, name="up4")(x5, x4, train=train)
        y = UpBlock(BASE * 2, dtype=self.dtype, name="up3")(y, x3, train=train)
        y = UpBlock(BASE, dtype=self.dtype, name="up2")(y, x2, train=train)
        y = UpBlock(BASE, dtype=self.dtype, name="up1")(y, x1, train=train)
        logits = _head_1x1(self.n_classes, self.dtype)(y)
        return logits, cl_out


class UNetTaskAlig(nn.Module):
    """basicUnet.py:305-368 — UNetTask with CoordAtt3-gated skips."""

    n_classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        x = x.astype(self.dtype)
        x1, x2, x3, x4, x5 = _Trunk(dtype=self.dtype, name="trunk")(x, train=train)
        cl_feat, x5 = TransformerDecoder(
            dim=BASE * 8, depth=1, heads=8, dim_head=64, mlp_dim=2048,
            pos_size=x5.shape[1], dtype=self.dtype, name="task2",
        )(x5, x5, train=train)
        cl_out = _cls_head(cl_feat, self.dtype)
        y = UpBlockAlig(BASE * 4, dtype=self.dtype, name="up4")(x5, x4, train=train)
        y = UpBlockAlig(BASE * 2, dtype=self.dtype, name="up3")(y, x3, train=train)
        y = UpBlockAlig(BASE, dtype=self.dtype, name="up2")(y, x2, train=train)
        y = UpBlockAlig(BASE, dtype=self.dtype, name="up1")(y, x1, train=train)
        logits = _head_1x1(self.n_classes, self.dtype)(y)
        return logits, cl_out


class UNetTaskAligWeight(nn.Module):
    """The flagship segmentation model (basicUnet.py:369-437).

    Gated-skip UNet with the dual-stream transformer bottleneck; only the
    segmentation stream feeds the decoder and only seg logits are returned.
    For a 224x224 input the bottleneck runs at 14x14x512 (196 tokens).
    """

    n_classes: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        x1, x2, x3, x4, x5 = _Trunk(dtype=self.dtype, name="trunk")(x, train=train)
        _cl_feat, out0 = TransformerDecoder(
            dim=BASE * 8, depth=1, heads=8, dim_head=64, mlp_dim=2048,
            pos_size=x5.shape[1], dtype=self.dtype, name="task2",
        )(x5, x5, train=train)
        y = UpBlockAlig(BASE * 4, dtype=self.dtype, name="up4")(out0, x4, train=train)
        y = UpBlockAlig(BASE * 2, dtype=self.dtype, name="up3")(y, x3, train=train)
        y = UpBlockAlig(BASE, dtype=self.dtype, name="up2")(y, x2, train=train)
        y = UpBlockAlig(BASE, dtype=self.dtype, name="up1")(y, x1, train=train)
        logits = _head_1x1(self.n_classes, self.dtype)(y)
        return logits
