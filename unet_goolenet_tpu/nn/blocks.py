"""UNet building blocks (NHWC, flax.linen).

Mirrors the live block zoo of 分割/nets/basicUnet.py — re-architected for TPU:
BatchNorm folds into the conv at inference, the 2x2/s2 transposed conv lowers to one
MXU matmul + depth-to-space (ops.conv_transpose2x2), and all tensors stay NHWC so XLA
tiles convs straight onto the MXU.

Parity quirks preserved on purpose (they affect trained weights/behaviour):
  * CoordAtt3 declares a DeformConv2d that its forward never uses
    (basicUnet.py:213 vs 215-231) — we simply don't declare it; the checkpoint
    converter drops those parameters.
  * activation lookup accepts any name, defaulting to ReLU (basicUnet.py:10-15).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from unet_goolenet_tpu.nn.init import torch_conv_init, torch_bias_init
from unet_goolenet_tpu.ops.conv import conv_transpose2x2
from unet_goolenet_tpu.ops.pool import max_pool2d

Dtype = Any


def get_activation(name: str) -> Callable[[jax.Array], jax.Array]:
    table = {
        "relu": jax.nn.relu,
        "sigmoid": jax.nn.sigmoid,
        "gelu": jax.nn.gelu,
        "tanh": jnp.tanh,
        "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
        "silu": jax.nn.silu,
        "identity": lambda x: x,
    }
    return table.get(name.lower(), jax.nn.relu)


class TorchConv(nn.Module):
    """nn.Conv with PyTorch-default init and explicit symmetric padding."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        fan_in = self.kernel[0] * self.kernel[1] * cin
        return nn.Conv(
            self.features,
            self.kernel,
            strides=self.stride,
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            kernel_init=torch_conv_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvBatchNorm(nn.Module):
    """conv3x3(p1) -> BatchNorm -> activation (basicUnet.py:25-40)."""

    features: int
    activation: str = "ReLU"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = TorchConv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="norm",
        )(x)
        return get_activation(self.activation)(x)


class ConvStack(nn.Module):
    """n consecutive ConvBatchNorm blocks (_make_nConv, basicUnet.py:17-23)."""

    features: int
    n_convs: int = 2
    activation: str = "ReLU"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        for i in range(self.n_convs):
            x = ConvBatchNorm(
                self.features, self.activation, dtype=self.dtype, name=f"block{i}"
            )(x, train=train)
        return x


class DownBlock(nn.Module):
    """maxpool2x2 then ConvStack (basicUnet.py:42-52)."""

    features: int
    n_convs: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        # ops.max_pool2d (not nn.max_pool): its 2x2/s2 path carries the fast
        # elementwise-mask backward, shared with the packed engine pool so
        # flax-path and engine-path training grads use one tie rule.
        x = max_pool2d(x, 2, 2)
        return ConvStack(self.features, self.n_convs, dtype=self.dtype, name="nConvs")(
            x, train=train
        )


class UpConv2x2(nn.Module):
    """ConvTranspose 2x2 stride 2 keeping channel count, lowered to a matmul +
    depth-to-space (see ops.conv_transpose2x2)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        # torch ConvTranspose2d default init uses fan derived from (out, kh, kw)
        bound_fan = c * 4
        w = self.param("kernel", torch_conv_init, (2, 2, c, c))
        b = self.param("bias", torch_bias_init(bound_fan), (c,))
        return conv_transpose2x2(
            x.astype(self.dtype), w.astype(self.dtype), b.astype(self.dtype)
        )


class UpBlock(nn.Module):
    """Upscale + skip concat + ConvStack (basicUnet.py:54-68)."""

    features: int
    n_convs: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, skip: jax.Array, *, train: bool = False
    ) -> jax.Array:
        up = UpConv2x2(dtype=self.dtype, name="up")(x)
        x = jnp.concatenate([up, skip], axis=-1)
        return ConvStack(self.features, self.n_convs, dtype=self.dtype, name="nConvs")(
            x, train=train
        )


class CoordAtt(nn.Module):
    """Coordinate attention gate over (gate, skip) pairs (basicUnet.py:70-114).

    Pools both streams to (H,1) and (1,W) strips, mixes them through 1x1 convs, and
    gates the skip with sigmoid attention along each axis. Not used by the flagship
    model (UpBlockAlig uses CoordAtt3) but part of the reference surface.
    """

    mip: int  # inp1 // reduction
    oup: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g: jax.Array, x: jax.Array, *, train: bool = False) -> jax.Array:
        n, h, w, c = x.shape

        def strip_pool(t):
            th = jnp.mean(t, axis=2, keepdims=True)  # (N,H,1,C)
            tw = jnp.mean(t, axis=1, keepdims=True)  # (N,1,W,C)
            tw = jnp.transpose(tw, (0, 2, 1, 3))  # (N,W,1,C)
            return jnp.concatenate([th, tw], axis=1)  # (N,H+W,1,C)

        gy = strip_pool(g)
        xy = strip_pool(x)
        gy = TorchConv(self.mip, (1, 1), dtype=self.dtype, name="conv1")(gy)
        gy = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                          dtype=self.dtype, name="bn1")(gy)
        gy = jax.nn.relu(gy)
        xy = TorchConv(self.mip, (1, 1), dtype=self.dtype, name="conv2")(xy)
        xy = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                          dtype=self.dtype, name="bn2")(xy)
        xy = jax.nn.relu(xy)

        g_h, g_w = gy[:, :h], gy[:, h:]
        x_h, x_w = xy[:, :h], xy[:, h:]
        a_h = (x_h + g_h) / 2  # (N,H,1,mip)
        a_w = jnp.transpose((x_w + g_w) / 2, (0, 2, 1, 3))  # (N,1,W,mip)
        a_h = jax.nn.sigmoid(TorchConv(self.oup, (1, 1), dtype=self.dtype, name="conv_h")(a_h))
        a_w = jax.nn.sigmoid(TorchConv(self.oup, (1, 1), dtype=self.dtype, name="conv_w")(a_w))
        return x * a_h * a_w


class CoordAtt3(nn.Module):
    """Skip-connection gate used by the flagship model (basicUnet.py:201-231).

    e = encoder skip, d = decoder upsample. Channel attention from pooled encoder
    features gates the transformed decoder stream:
        out = CBN(e) + sigmoid(fc(relu(fc_a(GAP)) + relu(fc_m(GMP)))) * CBN(d) + CBN(d)
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, e: jax.Array, d: jax.Array, *, train: bool = False) -> jax.Array:
        c = self.features
        e1 = ConvStack(c, 1, dtype=self.dtype, name="conv1_e")(e, train=train)
        avg = jnp.mean(e1, axis=(1, 2), keepdims=True)  # (N,1,1,C)
        mx = jnp.max(e1, axis=(1, 2), keepdims=True)
        fa = TorchConv(c // 2, (1, 1), dtype=self.dtype, name="fc_avg")(avg)
        fm = TorchConv(c // 2, (1, 1), dtype=self.dtype, name="fc_max")(mx)
        s = jax.nn.relu(fa) + jax.nn.relu(fm)
        s = jax.nn.sigmoid(
            TorchConv(c, (1, 1), dtype=self.dtype, name="fc_out")(s)
        )
        d2 = ConvStack(c, 1, dtype=self.dtype, name="conv2_e")(d, train=train)
        return e1 + s * d2 + d2


class UpBlockAlig(nn.Module):
    """Upscale, gate the skip with CoordAtt3, concat, ConvStack
    (basicUnet.py:115-129)."""

    features: int
    n_convs: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, skip: jax.Array, *, train: bool = False
    ) -> jax.Array:
        up = UpConv2x2(dtype=self.dtype, name="up")(x)
        gated = CoordAtt3(up.shape[-1], dtype=self.dtype, name="cca")(
            skip, up, train=train
        )
        x = jnp.concatenate([up, gated], axis=-1)
        return ConvStack(self.features, self.n_convs, dtype=self.dtype, name="nConvs")(
            x, train=train
        )


class DeepBlock(nn.Module):
    """Experimental boundary-emphasis refinement block (basicUnet.py:438-461)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, skip: jax.Array, *, train: bool = False
    ) -> jax.Array:
        up = UpConv2x2(dtype=self.dtype, name="up")(x)
        cat = jnp.concatenate([up, skip], axis=-1)
        a = ConvStack(1, 1, activation="Sigmoid", dtype=self.dtype, name="nConvs_1")(
            cat, train=train
        )
        a = 1.0 - jnp.abs(a - 0.5)
        y = skip * a
        return ConvStack(self.features, 1, dtype=self.dtype, name="nConvs_2")(
            y, train=train
        )


class Dilation(nn.Module):
    """Wrapper applying DeepBlock at the finest scale (basicUnet.py:463-475)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, out3: jax.Array, out4: jax.Array, *, train: bool = False
    ) -> jax.Array:
        return DeepBlock(64, dtype=self.dtype, name="out4")(out3, out4, train=train)


class DepthwiseSeparableConv(nn.Module):
    """Experimental uncertainty-band feature augmenter (basicUnet.py:477-512):
    projects to a 1-channel sigmoid map, emphasises the 0.5-uncertainty band,
    re-expands and concatenates with the input."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        diff = TorchConv(1, (1, 1), dtype=self.dtype, name="out")(x)
        diff = jax.nn.sigmoid(diff)
        diff = 1.0 - jnp.abs(diff - 0.5)
        diff = ConvStack(self.features, 2, dtype=self.dtype, name="nConvs")(
            diff, train=train
        )
        return jnp.concatenate([x, diff], axis=-1)


class DeformConv2d(nn.Module):
    """Deformable convolution v2 (reference: nets/deform_conv_v2.py:5-15, which wraps
    torchvision.ops.deform_conv2d). Offsets come from a regular conv; sampling is
    bilinear at offset positions. Present for surface completeness — the reference
    declares it in CoordAtt3 but never calls it."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel
        offsets = TorchConv(2 * kh * kw, self.kernel, padding=kh // 2,
                            dtype=self.dtype, name="offset_conv")(x)
        w = self.param("kernel", torch_conv_init, (kh, kw, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return deform_conv2d(x, offsets, w, b)


def deform_conv2d(
    x: jax.Array, offsets: jax.Array, w: jax.Array, b: Optional[jax.Array] = None
) -> jax.Array:
    """Functional deformable conv (stride 1, 'same' padding).

    x: (N,H,W,Cin); offsets: (N,H,W,2*kh*kw) ordered (dy, dx) per tap, matching
    torchvision; w: (kh,kw,Cin,Cout).
    """
    n, h, ww, cin = x.shape
    kh, kw, _, cout = w.shape
    off = offsets.reshape(n, h, ww, kh * kw, 2)
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    xs = jnp.arange(ww, dtype=jnp.float32)[None, None, :, None]
    ky = jnp.arange(kh, dtype=jnp.float32) - (kh - 1) / 2
    kx = jnp.arange(kw, dtype=jnp.float32) - (kw - 1) / 2
    base_y = (ys + ky.repeat(kw)[None, None, None, :])  # (1,H,1,K)
    base_x = (xs + jnp.tile(kx, kh)[None, None, None, :])
    py = base_y + off[..., 0]
    px = base_x + off[..., 1]

    def bilinear(img, yy, xx):
        # img: (H,W,Cin); yy/xx: (H,W,K)
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        wy = yy - y0
        wx = xx - x0

        def gather(yi, xi):
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < ww)
            yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(xi, 0, ww - 1).astype(jnp.int32)
            vals = img[yi, xi]  # (H,W,K,Cin)
            return jnp.where(valid[..., None], vals, 0.0)

        v00 = gather(y0, x0)
        v01 = gather(y0, x0 + 1)
        v10 = gather(y0 + 1, x0)
        v11 = gather(y0 + 1, x0 + 1)
        wy = wy[..., None]
        wx = wx[..., None]
        return (
            v00 * (1 - wy) * (1 - wx)
            + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx)
            + v11 * wy * wx
        )

    sampled = jax.vmap(bilinear)(x.astype(jnp.float32), py, px)  # (N,H,W,K,Cin)
    wmat = w.reshape(kh * kw * cin, cout)
    out = jnp.dot(
        sampled.reshape(n, h, ww, kh * kw * cin), wmat,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)
