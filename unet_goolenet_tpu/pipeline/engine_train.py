"""Train-mode engine forward: the pixel-packed UNet forward with REAL BatchNorm
batch statistics (and running-stat updates), for the training step.

The inference engine (pipeline/engine.py) folds BatchNorm into the convs — not
possible in train mode, where BN must normalise by the CURRENT batch's
statistics and advance the running averages. This module re-implements the
flax `model.apply(train=True, mutable=['batch_stats'])` forward of
UNetTaskAligWeight as a pure function over the same variable trees, with the
64-channel levels in the pixel-packed layout (ops/packed.py):

    unet_forward_packed_train(params, batch_stats, x)
        -> (logits, new_batch_stats)

BatchNorm semantics match flax.linen.BatchNorm exactly (verified against the
flax source + tests/test_engine_train.py): statistics in f32
(force_float32_reductions), fast variance E[x^2]-E[x]^2 clipped at 0,
running = momentum*running + (1-momentum)*batch with momentum 0.9, eps 1e-5,
normalisation computed in f32 and cast to the compute dtype. Packed tensors
compute per-LOGICAL-channel statistics by folding the two lane halves into the
reduction. Gradients flow through the batch statistics as in any BN training
graph (jax autodiff); the returned running stats carry stop_gradient.

The whole forward is differentiable and is used by
train.seg.make_seg_train_step(forward="engine-packed") — measured speedup in
benchmarks/RESULTS.md. The UNet has no dropout (reference tasks.py defaults
dropout=0), so BN mode is the ONLY train/eval difference.

Reference: 分割/nets/basicUnet.py:369-437 (model), 25-40 (ConvBatchNorm).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from unet_goolenet_tpu import ops
from unet_goolenet_tpu.ops import packed as P
from unet_goolenet_tpu.pipeline.engine import (
    _attention,
    _cross,
    _feed,
    _layernorm,
)

MOMENTUM = 0.9
EPS = 1e-5


def _bn_train(y: jax.Array, pn: Dict, sn: Dict, *, packed: bool):
    """flax-exact train-mode BatchNorm. y: conv output (compute dtype);
    pn={'scale','bias'} f32 params; sn={'mean','var'} f32 running stats.
    Returns (normalised y in y.dtype, {'mean','var'} new running stats)."""
    if packed:
        c = y.shape[-1] // 2
        y32 = y.astype(jnp.float32).reshape(y.shape[:-1] + (2, c))
        red = tuple(range(y32.ndim - 1))
    else:
        y32 = y.astype(jnp.float32)
        red = tuple(range(y32.ndim - 1))
    mean = jnp.mean(y32, axis=red)
    var = jnp.maximum(jnp.mean(y32 * y32, axis=red) - mean * mean, 0.0)
    mul = jax.lax.rsqrt(var + EPS) * pn["scale"].astype(jnp.float32)
    bias = pn["bias"].astype(jnp.float32)
    mean_b = mean
    if packed:
        mul = jnp.tile(mul, 2)
        bias = jnp.tile(bias, 2)
        mean_b = jnp.tile(mean, 2)
    # subtract-first, as flax does: (y - mean) * mul + bias. The algebraically
    # equal y*mul + (bias - mean*mul) cancels catastrophically in f32 (y*mul
    # and mean*mul are large and close) — measured 1% grad error vs f64 truth.
    out = ((y.astype(jnp.float32) - mean_b) * mul + bias).astype(y.dtype)
    new = {
        "mean": jax.lax.stop_gradient(
            MOMENTUM * sn["mean"] + (1 - MOMENTUM) * mean),
        "var": jax.lax.stop_gradient(
            MOMENTUM * sn["var"] + (1 - MOMENTUM) * var),
    }
    return out, new


def _cbn_t(x, p, s, *, packed: bool, relu: bool = True):
    """ConvBatchNorm block, train mode; returns (out, new norm stats)."""
    w = p["conv"]["conv"]["kernel"]
    b = p["conv"]["conv"]["bias"]
    if packed:
        y = P.conv3x3_pp(x, P.expand_weights_pp(w).astype(x.dtype),
                         b.astype(x.dtype), accum=x.dtype)
    else:
        y = ops.conv2d(x, w.astype(x.dtype), b.astype(x.dtype), padding=1,
                       accum_dtype=x.dtype)
    y, new = _bn_train(y, p["norm"], s["norm"], packed=packed)
    return (jax.nn.relu(y) if relu else y), {"norm": new}


def _stack_t(x, p, s, *, packed: bool, n: int = 2):
    new = {}
    for i in range(n):
        x, new[f"block{i}"] = _cbn_t(x, p[f"block{i}"], s[f"block{i}"],
                                     packed=packed)
    return x, new


def _conv1x1(x, p):
    return ops.conv2d(x, p["conv"]["kernel"].astype(x.dtype),
                      p["conv"]["bias"].astype(x.dtype), padding=0,
                      accum_dtype=x.dtype)


def _coord_att3_t(e, d, p, s, *, packed: bool):
    """CoordAtt3 train mode (basicUnet.py:201-231); both streams packed for the
    64-channel level, dense otherwise."""
    e1, n1 = _cbn_t(e, p["conv1_e"]["block0"], s["conv1_e"]["block0"],
                    packed=packed)
    if packed:
        avg, mx = P.mean_max_hw_p(e1)
    else:
        avg = jnp.mean(e1, axis=(1, 2), keepdims=True)
        mx = jnp.max(e1, axis=(1, 2), keepdims=True)
    gate = jax.nn.sigmoid(_conv1x1(
        jax.nn.relu(_conv1x1(avg, p["fc_avg"])) +
        jax.nn.relu(_conv1x1(mx, p["fc_max"])), p["fc_out"]))
    d2, n2 = _cbn_t(d, p["conv2_e"]["block0"], s["conv2_e"]["block0"],
                    packed=packed)
    if packed:
        out = e1 + P.scale_p(d2, gate) + d2
    else:
        out = e1 + gate * d2 + d2
    return out, {"conv1_e": {"block0": n1}, "conv2_e": {"block0": n2}}


def _split_sum_cbn_t(a, wa, b_in, wb, p_block, s_block, *, up_variant: bool):
    """Train-mode ConvBatchNorm over concat([a, b]) as split-sum convs.

    wa/wb are the block-rows of the block's conv kernel (already split by the
    caller); bias comes from the block params; BN train on the summed output.
    up_variant: inputs dense -> packed out (expand_weights_up + stride (1,2));
    else packed -> packed."""
    bias = p_block["conv"]["conv"]["bias"]
    if up_variant:
        # logical-weight variant: same forward, dense-equivalent backward
        # (kills the four dilated convs autodiff emits for the strided head)
        y = P.conv3x3_up2_l(a, wa, b_in, wb, bias, accum=a.dtype)
    else:
        y = P.conv3x3_pp2(a, P.expand_weights_pp(wa).astype(a.dtype),
                          b_in, P.expand_weights_pp(wb).astype(a.dtype),
                          bias.astype(a.dtype), accum=a.dtype)
    y, new = _bn_train(y, p_block["norm"], s_block["norm"], packed=True)
    return jax.nn.relu(y), {"norm": new}


def _up_alig_p_t(x_p, skip_p, p, s):
    """UpBlockAlig train mode, fully packed (the 64-channel up1 level)."""
    up_p = P.conv_transpose2x2_p(x_p, p["up"]["kernel"].astype(x_p.dtype),
                                 p["up"]["bias"].astype(x_p.dtype),
                                 accum=x_p.dtype)
    gated_p, n_cca = _coord_att3_t(skip_p, up_p, p["cca"], s["cca"],
                                   packed=True)
    w = p["nConvs"]["block0"]["conv"]["conv"]["kernel"]
    c = up_p.shape[-1] // 2
    h_p, n0 = _split_sum_cbn_t(up_p, w[:, :, :c], gated_p, w[:, :, c:],
                               p["nConvs"]["block0"], s["nConvs"]["block0"],
                               up_variant=False)
    out, n1 = _cbn_t(h_p, p["nConvs"]["block1"], s["nConvs"]["block1"],
                     packed=True)
    return out, {"cca": n_cca, "nConvs": {"block0": n0, "block1": n1}}


def _up_alig_t(x, skip, p, s):
    """UpBlockAlig train mode, dense (the >=128-channel levels)."""
    up = ops.conv_transpose2x2(x, p["up"]["kernel"].astype(x.dtype),
                               p["up"]["bias"].astype(x.dtype),
                               accum_dtype=x.dtype)
    gated, n_cca = _coord_att3_t(skip, up, p["cca"], s["cca"], packed=False)
    cat = jnp.concatenate([up, gated], axis=-1)
    out, n_convs = _stack_t(cat, p["nConvs"], s["nConvs"], packed=False)
    return out, {"cca": n_cca, "nConvs": n_convs}


def _conv_proj_t(x, pw, pbn, sbn):
    """Conv2dReLU projection (tasks.py:98-120) train mode: conv(bias=False) +
    BN + ReLU."""
    y = ops.conv2d(x, pw["conv"]["kernel"].astype(x.dtype), None, padding=1,
                   accum_dtype=x.dtype)
    y, new = _bn_train(y, pbn, sbn, packed=False)
    return jax.nn.relu(y), new


def _transformer_t(x, m, p, s, *, heads=8, dim=512):
    n, h, w, c = x.shape
    scale = dim ** -0.5  # the reference's dim**-0.5 quirk (tasks.py:63,126)
    x, n_cl = _conv_proj_t(x, p["conv_cl_conv"], p["conv_cl_bn"],
                           s["conv_cl_bn"])
    m, n_seg = _conv_proj_t(m, p["conv_seg_conv"], p["conv_seg_bn"],
                            s["conv_seg_bn"])
    x = x + p["pos_embedding_cl"].astype(x.dtype)
    m = m + p["pos_embedding_seg"].astype(m.dtype)
    x = x.reshape(n, h * w, c)
    m = m.reshape(n, h * w, c)
    i = 0
    while f"layer{i}" in p:
        lp = p[f"layer{i}"]
        xn = _layernorm(x, lp["x_att_norm"])
        mn = _layernorm(m, lp["m_att_norm"])
        x_att = _attention(xn, lp["attention1"], heads, scale)
        m_att = _attention(mn, lp["attention2"], heads, scale)
        x_cross = _cross(xn, mn, lp["cross_attention_cl"], heads, scale)
        m_cross = _cross(mn, xn, lp["cross_attention_cl"], heads, scale)
        x_mid = x_att + x_cross + x
        m_mid = m_att + m_cross + m
        x = x_mid + _feed(_layernorm(x_mid, lp["x_mlp_norm"]), lp["x_feed"])
        m = m_mid + _feed(_layernorm(m_mid, lp["m_mlp_norm"]), lp["m_feed"])
        i += 1
    stats = {"conv_cl_bn": n_cl, "conv_seg_bn": n_seg}
    return x.reshape(n, h, w, c), m.reshape(n, h, w, c), stats


def _inc_t(x, p, s):
    return _cbn_t(x, p, s, packed=True)


def _up2_head_t(y, skip, p2, s2):
    """up2 train mode: cca dense at 128ch; output convs emit packed 64ch
    (split-sum strided head). Returns (packed out, new stats)."""
    up = ops.conv_transpose2x2(y, p2["up"]["kernel"].astype(y.dtype),
                               p2["up"]["bias"].astype(y.dtype),
                               accum_dtype=y.dtype)
    gated, n_cca2 = _coord_att3_t(skip, up, p2["cca"], s2["cca"],
                                  packed=False)
    w0 = p2["nConvs"]["block0"]["conv"]["conv"]["kernel"]
    c = up.shape[-1]
    y_p, n_b0 = _split_sum_cbn_t(up, w0[:, :, :c], gated, w0[:, :, c:],
                                 p2["nConvs"]["block0"],
                                 s2["nConvs"]["block0"], up_variant=True)
    y_p, n_b1 = _cbn_t(y_p, p2["nConvs"]["block1"],
                       s2["nConvs"]["block1"], packed=True)
    return y_p, {"cca": n_cca2, "nConvs": {"block0": n_b0, "block1": n_b1}}


def unet_forward_packed_train(
    params: Dict[str, Any], batch_stats: Dict[str, Any], x: jax.Array,
    *, remat: Tuple[str, ...] = (), dense_up1: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Train-mode forward of UNetTaskAligWeight with packed 64-channel levels.

    Matches model.apply({'params','batch_stats'}, x, train=True,
    mutable=['batch_stats']) to float tolerance (tests/test_engine_train.py);
    requires an even image width. The compute dtype is x.dtype (pass bf16
    inputs for the mixed-precision mode; params stay f32).

    remat: level names from {'up1', 'up2', 'inc'} to wrap in jax.checkpoint —
    the backward then recomputes that level's forward instead of loading its
    saved intermediates from HBM (the big 224²/112² levels are HBM-bound in
    the backward, benchmarks/bwd_profile.py). Identical values/grads, only
    the autodiff schedule changes.

    dense_up1=True runs the up1 level + outc DENSE (unpack after up2's
    packed output; _up_alig_t at 64 channels): the packed layout pays 2x
    logical FLOPs in BOTH conv directions, and the b16 backward attribution
    (RESULTS.md queue 19) has the packed up1 backward at 32% of logical
    ideal (9.42 ms) — a dense tail halves its FLOP bill if XLA's dense
    64-channel backward schedules anywhere near the down-level 69-77%.
    A/B knob, benchmarks/train_bench.py --dense-up1."""
    p, s = params, batch_stats
    t, ts = p["trunk"], s["trunk"]
    n, hh, ww, _ = x.shape
    new_trunk: Dict[str, Any] = {}

    ckpt = lambda name, fn: jax.checkpoint(fn) if name in remat else fn

    x_p = x.reshape(n, hh, ww // 2, 6)
    x1_p, new_trunk["inc"] = ckpt("inc", _inc_t)(x_p, t["inc"], ts["inc"])

    h = P.max_pool2x2_p_to_dense(x1_p)
    h, n_d1 = _stack_t(h, t["down1"]["nConvs"], ts["down1"]["nConvs"],
                       packed=False)
    new_trunk["down1"] = {"nConvs": n_d1}
    feats = [h]
    for i in range(2, 5):
        h = ops.max_pool2d(h, 2)
        h, n_di = _stack_t(h, t[f"down{i}"]["nConvs"], ts[f"down{i}"]["nConvs"],
                           packed=False)
        new_trunk[f"down{i}"] = {"nConvs": n_di}
        feats.append(h)

    _, out0, n_task2 = _transformer_t(feats[3], feats[3], p["task2"],
                                      s["task2"])
    y, n_up4 = _up_alig_t(out0, feats[2], p["up4"], s["up4"])
    y, n_up3 = _up_alig_t(y, feats[1], p["up3"], s["up3"])

    y_p, n_up2 = ckpt("up2", _up2_head_t)(y, feats[0], p["up2"], s["up2"])

    if dense_up1:
        # dense tail: unpack is a layout-preserving reshape; the level runs
        # logical-FLOP dense convs and outc is one (M, 64) @ (64, ncls) dot
        yd = P.unpack(y_p)
        x1d = P.unpack(x1_p)
        yd, n_up1 = ckpt("up1", _up_alig_t)(yd, x1d, p["up1"], s["up1"])
        k = p["outc"]["conv"]["kernel"][0, 0].astype(yd.dtype)
        logits = (yd @ k
                  + p["outc"]["conv"]["bias"].astype(yd.dtype))
    else:
        y_p, n_up1 = ckpt("up1", _up_alig_p_t)(y_p, x1_p, p["up1"], s["up1"])
        out_p = P.conv1x1_p(y_p, p["outc"]["conv"]["kernel"][0, 0],
                            p["outc"]["conv"]["bias"], accum=y_p.dtype)
        logits = P.unpack(out_p)

    new_stats = {
        "trunk": new_trunk,
        "task2": n_task2,
        "up4": n_up4,
        "up3": n_up3,
        "up2": n_up2,
        "up1": n_up1,
    }
    return logits, new_stats
