"""Device-resident batched augmentation (the TPU-first replacement for the host
PIL pipeline in data/augment.py).

Why: the reference augments ROI crops on the host inside Dataset.__getitem__
(分类/ROI_main.py:117-122), forcing a device->host->device round trip per item.
Here the same op set runs as one jitted, vmapped graph over the batch, driven by a
jax PRNGKey — so stage-2 training never leaves the device:
  UNet -> mask -> crop -> AUGMENT -> GoogLeNet, all in one XLA program.

Semantics mirror data_utils.py/Augmenter (same probabilities, ranges, and
resampling: NEAREST rotation/shear like torchvision's defaults, bilinear
scale-resize). Hue jitter uses an RGB-space rotation approximation rather than an
exact HSV round trip; the reference only ever uses hue=0.1, where the difference
is below quantisation. Randomness: one key per batch, split per image and per op
— fully deterministic given the key (the reference mixes three host RNGs).

Images are (N, S, S, 3) float in [0,1]; optional masks (N, S, S) int.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from unet_goolenet_tpu.data.augment import AugmentConfig


# ------------------------------------------------------------------ primitives


def _affine_sample_nearest(img: jax.Array, mat: jax.Array, fill: float = 0.0):
    """PIL-exact inverse-warp with NEAREST resampling.

    PIL samples the affine map at output pixel CENTRES (index + 0.5) about the
    geometric centre (w/2, h/2) and takes floor of the resulting input
    coordinate. `mat` (2, 2) maps centred output coords -> centred input coords.
    """
    h, w, c = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) + 0.5,
                          jnp.arange(w, dtype=jnp.float32) + 0.5, indexing="ij")
    cy, cx = h / 2.0, w / 2.0
    xo = xx - cx
    yo = yy - cy
    xi = mat[0, 0] * xo + mat[0, 1] * yo + cx
    yi = mat[1, 0] * xo + mat[1, 1] * yo + cy
    ix = jnp.floor(xi).astype(jnp.int32)
    iy = jnp.floor(yi).astype(jnp.int32)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    out = img[iy, ix]
    return jnp.where(valid[..., None], out, fill)


def rotate_nearest(img: jax.Array, angle_deg: jax.Array, fill: float = 0.0):
    """PIL Image.rotate(angle) semantics: CCW, nearest, no expand, fill 0."""
    a = jnp.deg2rad(angle_deg)
    ca, sa = jnp.cos(a), jnp.sin(a)
    mat = jnp.stack([jnp.stack([ca, -sa]), jnp.stack([sa, ca])])
    return _affine_sample_nearest(img, mat, fill)


def shear_x_nearest(img: jax.Array, deg: jax.Array, fill: float = 0.0):
    t = jnp.tan(jnp.deg2rad(deg))
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    mat = jnp.stack([jnp.stack([one, t]), jnp.stack([zero, one])])
    return _affine_sample_nearest(img, mat, fill)


def gaussian_blur(img: jax.Array, sigma: jax.Array, ksize: int = 9):
    """Separable gaussian with traced sigma (PIL GaussianBlur radius ~ sigma)."""
    r = ksize // 2
    xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma, 1e-3)
    k = jnp.exp(-0.5 * (xs / sig) ** 2)
    k = k / jnp.sum(k)
    # depthwise separable via conv over H then W (edge padding like PIL)
    def conv_axis(x, axis):
        xp = jnp.moveaxis(x, axis, 0)  # (L, ..., C)
        pad = [(r, r)] + [(0, 0)] * (xp.ndim - 1)
        xp = jnp.pad(xp, pad, mode="edge")
        idx = jnp.arange(x.shape[axis])
        out = sum(k[j] * jax.lax.dynamic_slice_in_dim(xp, j, x.shape[axis], 0)
                  for j in range(ksize))
        return jnp.moveaxis(out, 0, axis)

    return conv_axis(conv_axis(img, 0), 1)


_LUMA = jnp.array([0.299, 0.587, 0.114])


def adjust_contrast(img, factor):
    mean = jnp.mean(img @ _LUMA)
    return jnp.clip((img - mean) * factor + mean, 0.0, 1.0)


def adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_saturation(img, factor):
    gray = (img @ _LUMA)[..., None]
    return jnp.clip(gray + (img - gray) * factor, 0.0, 1.0)


def adjust_hue(img, shift):
    """Approximate hue rotation (YIQ chroma rotation by shift*2*pi)."""
    theta = shift * 2.0 * jnp.pi
    y = img @ _LUMA
    i = img @ jnp.array([0.596, -0.274, -0.322])
    q = img @ jnp.array([0.211, -0.523, 0.312])
    c, s = jnp.cos(theta), jnp.sin(theta)
    i2 = i * c - q * s
    q2 = i * s + q * c
    r = y + 0.956 * i2 + 0.621 * q2
    g = y - 0.272 * i2 - 0.647 * q2
    b = y - 1.106 * i2 + 1.703 * q2
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


# --------------------------------------------------------------- the augmenter


def _augment_one(cfg: AugmentConfig, key: jax.Array, img: jax.Array,
                 mask: Optional[jax.Array]):
    keys = jax.random.split(key, 20)
    s = cfg.img_size

    def gate(i, p):
        return jax.random.uniform(keys[i]) < p

    # gamma (data_utils.py:166-171): g in {1.0..2.4} step .1
    g = jax.random.randint(keys[0], (), 10, 25).astype(jnp.float32) / 10.0
    img = jnp.where(gate(1, cfg.p_gama), jnp.power(jnp.clip(img, 0, 1), 1.0 / g), img)

    do_h = gate(2, cfg.p_hflip)
    img = jnp.where(do_h, img[:, ::-1], img)
    do_v = gate(3, cfg.p_vflip)
    img = jnp.where(do_v, img[::-1], img)

    angle = jax.random.uniform(keys[4], (), minval=-30.0, maxval=30.0)
    do_rot = gate(5, cfg.p_rota)
    img = jnp.where(do_rot, rotate_nearest(img, angle), img)

    # scale (1..1.3) + random crop back to s: equivalently, crop a window of
    # side s/scale at a random offset and resize to s (bilinear)
    scale = jax.random.uniform(keys[6], (), minval=1.0, maxval=1.3)
    win = s / scale
    max_off = s - win
    oy = jax.random.uniform(keys[7], ()) * max_off
    ox = jax.random.uniform(keys[8], ()) * max_off
    do_scale = gate(9, cfg.p_scale)

    def crop_resize(t, method):
        ys = oy + (jnp.arange(s, dtype=jnp.float32) + 0.5) * (win / s) - 0.5
        xs = ox + (jnp.arange(s, dtype=jnp.float32) + 0.5) * (win / s) - 0.5
        if method == "nearest":
            iy = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, s - 1)
            ix = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, s - 1)
            return t[iy][:, ix]
        y0 = jnp.clip(jnp.floor(ys), 0, s - 1)
        x0 = jnp.clip(jnp.floor(xs), 0, s - 1)
        ty = (ys - y0)[:, None, None]
        tx = (xs - x0)[None, :, None]
        iy0 = y0.astype(jnp.int32)
        ix0 = x0.astype(jnp.int32)
        iy1 = jnp.clip(iy0 + 1, 0, s - 1)
        ix1 = jnp.clip(ix0 + 1, 0, s - 1)
        top = t[iy0][:, ix0] * (1 - tx) + t[iy0][:, ix1] * tx
        bot = t[iy1][:, ix0] * (1 - tx) + t[iy1][:, ix1] * tx
        return top * (1 - ty) + bot * ty

    img = jnp.where(do_scale, crop_resize(img, "bilinear"), img)

    sigma = jax.random.uniform(keys[10], ())
    img = jnp.where(gate(11, cfg.p_gaussn), gaussian_blur(img, sigma), img)

    cf = jax.random.uniform(keys[12], (), minval=0.8, maxval=2.0)
    img = jnp.where(gate(13, cfg.p_contr), adjust_contrast(img, cf), img)

    sh = jax.random.uniform(keys[14], (), minval=5.0, maxval=30.0)
    img = jnp.where(gate(15, cfg.p_distor), shear_x_nearest(img, sh), img)

    if cfg.color_jitter:
        b, c, sat, h = cfg.color_jitter
        jkeys = keys[16:20]  # fresh keys — keys[0] already fed the gamma draw
        if b:
            img = adjust_brightness(img, jax.random.uniform(
                jkeys[0], (), minval=max(0, 1 - b), maxval=1 + b))
        if c:
            img = adjust_contrast(img, jax.random.uniform(
                jkeys[1], (), minval=max(0, 1 - c), maxval=1 + c))
        if sat:
            img = adjust_saturation(img, jax.random.uniform(
                jkeys[2], (), minval=max(0, 1 - sat), maxval=1 + sat))
        if h:
            img = adjust_hue(img, jax.random.uniform(
                jkeys[3], (), minval=-h, maxval=h))

    if mask is not None:
        m3 = mask[..., None].astype(jnp.float32)
        m3 = jnp.where(do_h, m3[:, ::-1], m3)
        m3 = jnp.where(do_v, m3[::-1], m3)
        m3 = jnp.where(do_rot, rotate_nearest(m3, angle), m3)
        m3 = jnp.where(do_scale, crop_resize(m3, "nearest"), m3)
        mask = m3[..., 0].astype(mask.dtype)
    return img, mask


def make_device_augment(cfg: AugmentConfig, with_mask: bool = False):
    """Build a jittable batched augmenter: (key, imgs[, masks]) -> same shapes."""

    if with_mask:
        def run(key, imgs, masks):
            keys = jax.random.split(key, imgs.shape[0])
            return jax.vmap(partial(_augment_one, cfg))(keys, imgs, masks)
    else:
        def run(key, imgs):
            keys = jax.random.split(key, imgs.shape[0])
            out, _ = jax.vmap(lambda k, im: _augment_one(cfg, k, im, None))(keys, imgs)
            return out

    return jax.jit(run)
