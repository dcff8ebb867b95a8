"""GoogLeNet / Inception-v1 (stage-2 lesion grader), NHWC.

The reference wraps `torchvision.models.googlenet(pretrained=True)` with a new 6-way
fc (分类/ROI_main.py:86-95). To be checkpoint-compatible with that we implement the
*torchvision* flavour exactly:

  * BasicConv2d = conv(bias=False) + BatchNorm(eps=1e-3) + ReLU;
  * the "5x5" inception branch actually uses a 3x3 kernel (a historical torchvision
    bug kept for weight compatibility) — `fidelity='torchvision'`; the paper-correct
    5x5 is available with `fidelity='paper'`;
  * `transform_input=True` re-normalises inputs from [0,1]-mean0.5 to ImageNet stats
    (what pretrained torchvision models do — the reference inherits this silently);
  * aux classifiers exist after 4a and 4d; torchvision's pretrained load strips them
    (aux1=aux2=None), so the reference trains with main logits + CE only. We keep
    `aux_logits` as a flag: off mirrors the reference, on enables paper-style
    aux-loss training (BASELINE.json asks for aux heads).

All pooling is ceil-mode, matching torchvision.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from unet_goolenet_tpu.nn.blocks import TorchConv
from unet_goolenet_tpu.nn.init import torch_linear_init, torch_bias_init
from unet_goolenet_tpu.ops.pool import max_pool2d, adaptive_avg_pool

Dtype = Any


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int] = (1, 1)
    stride: Tuple[int, int] = (1, 1)
    padding: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = TorchConv(self.features, self.kernel, self.stride, self.padding,
                      use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return jax.nn.relu(x)


class Inception(nn.Module):
    """Four-branch inception module with channel concat."""

    ch1x1: int
    ch3x3red: int
    ch3x3: int
    ch5x5red: int
    ch5x5: int
    pool_proj: int
    fidelity: str = "torchvision"  # 'torchvision' (3x3 in branch3) or 'paper' (5x5)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b1 = BasicConv2d(self.ch1x1, dtype=self.dtype, name="branch1")(x, train=train)
        b2 = BasicConv2d(self.ch3x3red, dtype=self.dtype, name="branch2_0")(x, train=train)
        b2 = BasicConv2d(self.ch3x3, (3, 3), padding=1, dtype=self.dtype,
                         name="branch2_1")(b2, train=train)
        b3 = BasicConv2d(self.ch5x5red, dtype=self.dtype, name="branch3_0")(x, train=train)
        if self.fidelity == "torchvision":
            b3 = BasicConv2d(self.ch5x5, (3, 3), padding=1, dtype=self.dtype,
                             name="branch3_1")(b3, train=train)
        else:
            b3 = BasicConv2d(self.ch5x5, (5, 5), padding=2, dtype=self.dtype,
                             name="branch3_1")(b3, train=train)
        b4 = max_pool2d(x, 3, 1, padding=1, ceil_mode=True)
        b4 = BasicConv2d(self.pool_proj, dtype=self.dtype, name="branch4_1")(b4, train=train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionAux(nn.Module):
    """Aux head: adaptive-avgpool 4x4 -> 1x1 conv 128 -> fc 2048->1024 -> dropout 0.7
    -> fc -> classes (torchvision geometry)."""

    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = adaptive_avg_pool(x, (4, 4))
        x = BasicConv2d(128, dtype=self.dtype, name="conv")(x, train=train)
        x = x.reshape(x.shape[0], -1)  # (N, 4*4*128) = (N, 2048)
        x = nn.Dense(1024, kernel_init=torch_linear_init,
                     bias_init=torch_bias_init(2048), dtype=self.dtype, name="fc1")(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(0.7, deterministic=not train)(x)
        return nn.Dense(self.num_classes, kernel_init=torch_linear_init,
                        bias_init=torch_bias_init(1024), dtype=self.dtype,
                        name="fc2")(x)


_INCEPTION_CFG = {
    "inception3a": (64, 96, 128, 16, 32, 32),
    "inception3b": (128, 128, 192, 32, 96, 64),
    "inception4a": (192, 96, 208, 16, 48, 64),
    "inception4b": (160, 112, 224, 24, 64, 64),
    "inception4c": (128, 128, 256, 24, 64, 64),
    "inception4d": (112, 144, 288, 32, 64, 64),
    "inception4e": (256, 160, 320, 32, 128, 128),
    "inception5a": (256, 160, 320, 32, 128, 128),
    "inception5b": (384, 192, 384, 48, 128, 128),
}


def _transform_input(x: jax.Array) -> jax.Array:
    """torchvision's silent renormalisation for pretrained GoogLeNet: input assumed
    normalised with mean/std 0.5, re-expressed in ImageNet statistics."""
    r = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
    g = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
    b = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
    return jnp.concatenate([r, g, b], axis=-1)


class GoogLeNet(nn.Module):
    num_classes: int = 1000
    aux_logits: bool = False
    transform_input: bool = True
    dropout: float = 0.2
    fidelity: str = "torchvision"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        if self.transform_input:
            x = _transform_input(x)
        x = BasicConv2d(64, (7, 7), (2, 2), 3, dtype=self.dtype, name="conv1")(x, train=train)
        x = max_pool2d(x, 3, 2, ceil_mode=True)
        x = BasicConv2d(64, dtype=self.dtype, name="conv2")(x, train=train)
        x = BasicConv2d(192, (3, 3), padding=1, dtype=self.dtype, name="conv3")(x, train=train)
        x = max_pool2d(x, 3, 2, ceil_mode=True)

        def inc(name, t):
            return Inception(*_INCEPTION_CFG[name], fidelity=self.fidelity,
                             dtype=self.dtype, name=name)(t, train=train)

        x = inc("inception3a", x)
        x = inc("inception3b", x)
        x = max_pool2d(x, 3, 2, ceil_mode=True)
        x = inc("inception4a", x)
        aux1 = None
        if self.aux_logits:
            aux1 = InceptionAux(self.num_classes, dtype=self.dtype, name="aux1")(
                x, train=train)
        x = inc("inception4b", x)
        x = inc("inception4c", x)
        x = inc("inception4d", x)
        aux2 = None
        if self.aux_logits:
            aux2 = InceptionAux(self.num_classes, dtype=self.dtype, name="aux2")(
                x, train=train)
        x = inc("inception4e", x)
        x = max_pool2d(x, 2, 2, ceil_mode=True)
        x = inc("inception5a", x)
        x = inc("inception5b", x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, kernel_init=torch_linear_init,
                          bias_init=torch_bias_init(1024), dtype=self.dtype,
                          name="fc")(x)
        if self.aux_logits and train:
            # torchvision semantics: aux outputs only in training mode
            return logits, aux2, aux1
        return logits


class GoogLeNetClassifier(nn.Module):
    """The reference's stage-2 model (分类/ROI_main.py:86-95): GoogLeNet trunk with a
    6-way fc, aux heads stripped, transform_input on (pretrained torchvision
    semantics)."""

    num_classes: int = 6
    aux_logits: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return GoogLeNet(
            num_classes=self.num_classes,
            aux_logits=self.aux_logits,
            transform_input=True,
            dtype=self.dtype,
            name="googlenet",
        )(x, train=train)
