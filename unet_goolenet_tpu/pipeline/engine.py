"""Inference engine: a hand-scheduled forward pass of the flagship UNet built
directly on the ops layer from a flax variables tree.

Purpose: serving-path speed. Differences from the flax `model.apply` graph:
  * inference BatchNorm is FOLDED into the conv weights (ops.fold_batchnorm), so
    every ConvBatchNorm is a single conv+bias+relu — no separate normalisation
    passes over the big activations;
  * transposed convs use the matmul + depth-to-space lowering;
  * everything stays in the caller's dtype (bf16 for streaming) with f32
    accumulation.

Numerics match `UNetTaskAligWeight.apply(train=False)` to float tolerance
(tests/test_engine.py). The variables tree is the same one flax/the converter
produce — the engine is a pure function over it, no re-export needed.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from unet_goolenet_tpu import ops
from unet_goolenet_tpu.ops import packed as P


def _fold(p, s, *, eps=1e-5):
    """Folded (w, b) of a ConvBatchNorm block's conv+BN."""
    return ops.fold_batchnorm(
        p["conv"]["conv"]["kernel"], p["conv"]["conv"]["bias"],
        p["norm"]["scale"], p["norm"]["bias"], s["norm"]["mean"],
        s["norm"]["var"], eps)


def _cbn(x, p, s, *, eps=1e-5, relu=True):
    """ConvBatchNorm block from params p={conv:{conv:{kernel,bias}},norm:{...}}
    and batch_stats s={norm:{mean,var}}."""
    w, b = ops.fold_batchnorm(
        p["conv"]["conv"]["kernel"], p["conv"]["conv"]["bias"],
        p["norm"]["scale"], p["norm"]["bias"], s["norm"]["mean"], s["norm"]["var"],
        eps,
    )
    y = ops.conv2d(x, w.astype(x.dtype), b.astype(x.dtype), padding=1)
    return jax.nn.relu(y) if relu else y


def _stack(x, p, s, n=2):
    for i in range(n):
        x = _cbn(x, p[f"block{i}"], s[f"block{i}"])
    return x


def _conv1x1(x, p):
    return ops.conv2d(x, p["conv"]["kernel"].astype(x.dtype),
                      p["conv"]["bias"].astype(x.dtype), padding=0)


def _coord_att3(e, d, p, s):
    e1 = _stack(e, p["conv1_e"], s["conv1_e"], 1)
    avg = jnp.mean(e1, axis=(1, 2), keepdims=True)
    mx = jnp.max(e1, axis=(1, 2), keepdims=True)
    gate = jax.nn.sigmoid(_conv1x1(
        jax.nn.relu(_conv1x1(avg, p["fc_avg"])) +
        jax.nn.relu(_conv1x1(mx, p["fc_max"])), p["fc_out"]))
    d2 = _stack(d, p["conv2_e"], s["conv2_e"], 1)
    return e1 + gate * d2 + d2


def _up_alig(x, skip, p, s):
    up = ops.conv_transpose2x2(x, p["up"]["kernel"].astype(x.dtype),
                               p["up"]["bias"].astype(x.dtype))
    gated = _coord_att3(skip, up, p["cca"], s["cca"])
    return _stack(jnp.concatenate([up, gated], axis=-1), p["nConvs"], s["nConvs"])


def _attention(x, p, heads, scale):
    qkv = jnp.dot(x, p["to_qkv"]["kernel"].astype(x.dtype),
                  preferred_element_type=jnp.float32).astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return _attend(q, k, v, p["to_out"], heads, scale, x.dtype)


def _cross(x, m, p, heads, scale):
    q = jnp.dot(x, p["to_q"]["kernel"].astype(x.dtype))
    k = jnp.dot(m, p["to_k"]["kernel"].astype(x.dtype))
    v = jnp.dot(m, p["to_v"]["kernel"].astype(x.dtype))
    return _attend(q, k, v, p["to_out"], heads, scale, x.dtype)


def _attend(q, k, v, out_p, heads, scale, dtype):
    b, n, hd = q.shape
    d = hd // heads
    split = lambda t: t.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q), split(k), split(v)
    logits = jnp.einsum("bhid,bhjd->bhij", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(dtype)
    o = jnp.einsum("bhij,bhjd->bhid", attn, vh,
                   preferred_element_type=jnp.float32).astype(dtype)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, hd)
    return jnp.dot(o, out_p["kernel"].astype(dtype)) + out_p["bias"].astype(dtype)


def _layernorm(x, p, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    return xn * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _feed(x, p):
    h = jnp.dot(x, p["fc1"]["kernel"].astype(x.dtype)) + p["fc1"]["bias"].astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    return jnp.dot(h, p["fc2"]["kernel"].astype(x.dtype)) + p["fc2"]["bias"].astype(x.dtype)


def _conv_proj(x, pw, pbn, sbn):
    w, b = ops.fold_batchnorm(pw["conv"]["kernel"], None, pbn["scale"],
                              pbn["bias"], sbn["mean"], sbn["var"], 1e-5)
    return jax.nn.relu(ops.conv2d(x, w.astype(x.dtype), b.astype(x.dtype), padding=1))


def _transformer(x, m, p, s, *, heads=8, dim=512):
    n, h, w, c = x.shape
    scale = dim ** -0.5  # the reference's dim**-0.5 quirk
    x = _conv_proj(x, p["conv_cl_conv"], p["conv_cl_bn"], s["conv_cl_bn"])
    m = _conv_proj(m, p["conv_seg_conv"], p["conv_seg_bn"], s["conv_seg_bn"])
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
    return x.reshape(n, h, w, c), m.reshape(n, h, w, c)


def _basic_conv(x, p, s, *, stride=1, padding=0):
    """BasicConv2d (models/googlenet.py:36-49): conv(bias=False) + BN(eps 1e-3)
    + ReLU, BN folded into the conv at inference."""
    w, b = ops.fold_batchnorm(
        p["conv"]["conv"]["kernel"], None, p["bn"]["scale"], p["bn"]["bias"],
        s["bn"]["mean"], s["bn"]["var"], 1e-3,
    )
    return jax.nn.relu(ops.conv2d(x, w.astype(x.dtype), b.astype(x.dtype),
                                  stride=stride, padding=padding))


def _stem_conv_s2d(x, p, s):
    """The stem 7x7-stride-2 conv (3->64 @224) as a space-to-depth 4x4
    stride-1 conv: pad the kernel to 8x8 (zero tail), view the padded input as
    2x2 pixel blocks -> (112+4, 112+4, 12), so the contraction is one
    K=4*4*12=192 matmul instead of a 3-channel (lane-padded 3->128) 147-tap
    conv. Same taps, same sums — parity in tests/test_engine.py.
    Layout cousin of ops/packed.py (reference op: torchvision googlenet stem).
    """
    w, b = ops.fold_batchnorm(
        p["conv"]["conv"]["kernel"], None, p["bn"]["scale"], p["bn"]["bias"],
        s["bn"]["mean"], s["bn"]["var"], 1e-3,
    )
    w = w.astype(x.dtype)
    n, h, wd, c = x.shape
    co = w.shape[-1]
    # output o reads input rows 2o-3 .. 2o+3; with 3 rows of top pad that is
    # padded rows 2o .. 2o+6, i.e. blocks o .. o+3 exactly
    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
    hb, wb_ = (h + 8) // 2, (wd + 8) // 2
    xb = xp.reshape(n, hb, 2, wb_, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(n, hb, wb_, 4 * c)
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))          # (8,8,c,co)
    wb = w8.reshape(4, 2, 4, 2, c, co).transpose(0, 2, 1, 3, 4, 5)
    wb = wb.reshape(4, 4, 4 * c, co)
    y = jax.lax.conv_general_dilated(
        xb, wb.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    oh, ow = h // 2, wd // 2
    y = y[:, :oh, :ow] + b.astype(jnp.float32)
    return jax.nn.relu(y).astype(x.dtype)


def _inception(x, p, s, *, merge_1x1: bool = False):
    if merge_1x1:
        # the three 1x1 convs reading the SAME input (branch1, branch2_0,
        # branch3_0) as ONE conv with concatenated output channels — exactly
        # equal math (conv is linear in cout; relu is elementwise), one MXU
        # dot instead of three narrow ones (A/B knob, benchmarks/gnet_attr)
        ws, bs = zip(*(ops.fold_batchnorm(
            p[k]["conv"]["conv"]["kernel"], None, p[k]["bn"]["scale"],
            p[k]["bn"]["bias"], s[k]["bn"]["mean"], s[k]["bn"]["var"], 1e-3)
            for k in ("branch1", "branch2_0", "branch3_0")))
        wcat = jnp.concatenate(ws, axis=-1).astype(x.dtype)
        bcat = jnp.concatenate(bs).astype(x.dtype)
        y = jax.nn.relu(ops.conv2d(x, wcat, bcat))
        c1, c2 = ws[0].shape[-1], ws[1].shape[-1]
        b1 = y[..., :c1]
        b2 = y[..., c1:c1 + c2]
        b3 = y[..., c1 + c2:]
    else:
        b1 = _basic_conv(x, p["branch1"], s["branch1"])
        b2 = _basic_conv(x, p["branch2_0"], s["branch2_0"])
        b3 = _basic_conv(x, p["branch3_0"], s["branch3_0"])
    b2 = _basic_conv(b2, p["branch2_1"], s["branch2_1"], padding=1)
    # torchvision's 3x3-in-the-5x5-branch quirk: kernel shape carries the truth
    k3 = p["branch3_1"]["conv"]["conv"]["kernel"].shape[0]
    b3 = _basic_conv(b3, p["branch3_1"], s["branch3_1"], padding=k3 // 2)
    b4 = ops.max_pool2d(x, 3, 1, padding=1, ceil_mode=True)
    b4 = _basic_conv(b4, p["branch4_1"], s["branch4_1"])
    return jnp.concatenate([b1, b2, b3, b4], axis=-1)


def _transform_input(x):
    """models/googlenet.py:116-122 (torchvision pretrained renormalisation)."""
    r = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
    g = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
    b = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
    return jnp.concatenate([r, g, b], axis=-1)


def gnet_forward(variables: Dict[str, Any], x: jax.Array,
                 *, s2d_stem: bool = False,
                 merge_1x1: bool = False) -> jax.Array:
    """Engine forward of GoogLeNetClassifier (inference: aux heads off, dropout
    identity, transform_input on): every BasicConv2d's BatchNorm folded into its
    conv. Numerics match GoogLeNetClassifier.apply(train=False) to float
    tolerance (tests/test_engine.py). s2d_stem runs the 7x7/2 stem conv in the
    space-to-depth matmul form (_stem_conv_s2d; TPU serving default).
    merge_1x1 fuses each inception module's three same-input 1x1 convs into
    one (exact math; A/B knob, benchmarks/gnet_attr.py)."""
    p = variables["params"]["googlenet"]
    s = variables["batch_stats"]["googlenet"]
    x = _transform_input(x)
    if s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        x = _stem_conv_s2d(x, p["conv1"], s["conv1"])
    else:
        x = _basic_conv(x, p["conv1"], s["conv1"], stride=2, padding=3)
    x = ops.max_pool2d(x, 3, 2, ceil_mode=True)
    x = _basic_conv(x, p["conv2"], s["conv2"])
    x = _basic_conv(x, p["conv3"], s["conv3"], padding=1)
    x = ops.max_pool2d(x, 3, 2, ceil_mode=True)
    x = _inception(x, p["inception3a"], s["inception3a"], merge_1x1=merge_1x1)
    x = _inception(x, p["inception3b"], s["inception3b"], merge_1x1=merge_1x1)
    x = ops.max_pool2d(x, 3, 2, ceil_mode=True)
    for mod in ("inception4a", "inception4b", "inception4c", "inception4d",
                "inception4e"):
        x = _inception(x, p[mod], s[mod], merge_1x1=merge_1x1)
    x = ops.max_pool2d(x, 2, 2, ceil_mode=True)
    x = _inception(x, p["inception5a"], s["inception5a"], merge_1x1=merge_1x1)
    x = _inception(x, p["inception5b"], s["inception5b"], merge_1x1=merge_1x1)
    x = jnp.mean(x, axis=(1, 2))
    return jnp.dot(x, p["fc"]["kernel"].astype(x.dtype)) + \
        p["fc"]["bias"].astype(x.dtype)


def _cbn_pp(x_p, p, s, dtype):
    """ConvBatchNorm in packed layout (packed in -> packed out)."""
    w, b = _fold(p, s)
    return P.conv3x3_pp(x_p, P.expand_weights_pp(w).astype(dtype),
                        b.astype(dtype), relu=True)


def _cbn_up(x, p, s, dtype):
    """ConvBatchNorm, unpacked in -> packed out (chain heads)."""
    w, b = _fold(p, s)
    return P.conv3x3_up(x, P.expand_weights_up(w).astype(dtype),
                        b.astype(dtype), relu=True)


def _coord_att3_p(e_p, d_p, p, s, dtype):
    """CoordAtt3 with both streams packed (64-channel levels)."""
    e1_p = _cbn_pp(e_p, p["conv1_e"]["block0"], s["conv1_e"]["block0"], dtype)
    avg, mx = P.mean_max_hw_p(e1_p)
    gate = jax.nn.sigmoid(_conv1x1(
        jax.nn.relu(_conv1x1(avg, p["fc_avg"])) +
        jax.nn.relu(_conv1x1(mx, p["fc_max"])), p["fc_out"]))
    d2_p = _cbn_pp(d_p, p["conv2_e"]["block0"], s["conv2_e"]["block0"], dtype)
    return e1_p + P.scale_p(d2_p, gate) + d2_p


def _up_alig_p(x_p, skip_p, p, s, dtype):
    """UpBlockAlig fully in packed layout (up1: everything is 64-channel).

    The concat+conv is computed as a split-sum (conv(up) + conv(gated)) —
    identical math, no lane-shuffle concat (ops/packed.conv3x3_pp2)."""
    up_p = P.conv_transpose2x2_p(x_p, p["up"]["kernel"].astype(dtype),
                                 p["up"]["bias"].astype(dtype))
    gated_p = _coord_att3_p(skip_p, up_p, p["cca"], s["cca"], dtype)
    w, b = _fold(p["nConvs"]["block0"], s["nConvs"]["block0"])
    c = up_p.shape[-1] // 2
    h_p = P.conv3x3_pp2(
        up_p, P.expand_weights_pp(w[:, :, :c]).astype(dtype),
        gated_p, P.expand_weights_pp(w[:, :, c:]).astype(dtype),
        b.astype(dtype), relu=True)
    return _cbn_pp(h_p, p["nConvs"]["block1"], s["nConvs"]["block1"], dtype)


def unet_forward_packed_tail_fused(variables: Dict[str, Any], y_p, x1_p,
                                   dtype) -> jax.Array:
    """up1 + outc via the fused Pallas kernels (ops/pallas/up1.py).

    The gate pass runs as its own kernel (e1 ConvBatchNorm + the global
    mean/max accumulated across the row-tile grid — the global reduction is
    why the level splits in two); the tiny 1x1 squeeze-excite gate stays XLA.
    Everything after runs in one VMEM-resident kernel: deconv -> d2 ->
    gate-combine -> split-sum pair -> block1 -> outc. Returns packed logits
    (N, H, Wp, 2*ncls)."""
    from unet_goolenet_tpu.ops.pallas import up1 as PU

    p = variables["params"]
    s = variables["batch_stats"]
    u = p["up1"]
    us = s["up1"]
    w_e1, b_e1 = _fold(u["cca"]["conv1_e"]["block0"],
                       us["cca"]["conv1_e"]["block0"])
    e1_p, avg, mx = PU.fused_cbn_stats(x1_p, w_e1, b_e1)
    gate = jax.nn.sigmoid(_conv1x1(
        jax.nn.relu(_conv1x1(avg.astype(dtype), u["cca"]["fc_avg"])) +
        jax.nn.relu(_conv1x1(mx.astype(dtype), u["cca"]["fc_max"])),
        u["cca"]["fc_out"]))                             # (N,1,1,C)
    gate_p1 = jnp.tile(1.0 + gate[:, 0, 0, :], (1, 2))   # (N, 2C)
    w_d2, b_d2 = _fold(u["cca"]["conv2_e"]["block0"],
                       us["cca"]["conv2_e"]["block0"])
    w_pair, b_pair = _fold(u["nConvs"]["block0"], us["nConvs"]["block0"])
    w_blk1, b_blk1 = _fold(u["nConvs"]["block1"], us["nConvs"]["block1"])
    return PU.fused_up1_outc(
        y_p, e1_p, gate_p1,
        u["up"]["kernel"], u["up"]["bias"],
        w_d2, b_d2, w_pair, b_pair, w_blk1, b_blk1,
        p["outc"]["conv"]["kernel"][0, 0], p["outc"]["conv"]["bias"])


def _up_fused(y, skip, p, s, dtype, *, packed_out) -> jax.Array:
    """A decoder level via the fused Pallas kernels (ops/pallas/up2.py):
    gate pass (dense e1 ConvBatchNorm + global mean/max), the tiny 1x1
    squeeze-excite gate in XLA, then one VMEM-resident kernel for deconv ->
    d2 -> gate-combine -> split-sum pair -> block1. packed_out=True (up2)
    returns the packed (N, H, W/2, 2*cq) output; False (up3/up4) the dense
    (N, H, W, cq) output."""
    from unet_goolenet_tpu.ops.pallas import up2 as PU2

    u = p
    us = s
    w_e1, b_e1 = _fold(u["cca"]["conv1_e"]["block0"],
                       us["cca"]["conv1_e"]["block0"])
    e1, avg, mx = PU2.fused_cbn_stats_dense(skip, w_e1, b_e1)
    gate = jax.nn.sigmoid(_conv1x1(
        jax.nn.relu(_conv1x1(avg.astype(dtype), u["cca"]["fc_avg"])) +
        jax.nn.relu(_conv1x1(mx.astype(dtype), u["cca"]["fc_max"])),
        u["cca"]["fc_out"]))                              # (N,1,1,C)
    gate_p1 = 1.0 + gate[:, 0, 0, :]                      # (N, C)
    w_d2, b_d2 = _fold(u["cca"]["conv2_e"]["block0"],
                       us["cca"]["conv2_e"]["block0"])
    w_pair, b_pair = _fold(u["nConvs"]["block0"], us["nConvs"]["block0"])
    w_blk1, b_blk1 = _fold(u["nConvs"]["block1"], us["nConvs"]["block1"])
    fn = PU2.fused_up2 if packed_out else PU2.fused_up_dense
    return fn(y, e1, gate_p1,
              u["up"]["kernel"], u["up"]["bias"],
              w_d2, b_d2, w_pair, b_pair, w_blk1, b_blk1)


def _up2_fused(y, skip, p, s, dtype) -> jax.Array:
    return _up_fused(y, skip, p, s, dtype, packed_out=True)


def _up2_packed_xla(y, skip, p, s, dtype):
    """The up2 level with dense inputs and PACKED output, all-XLA: dense
    deconv + dense CoordAtt3 (both 128-channel, MXU-friendly), then the
    concat+conv pair emitted straight into packed 64-channel layout as a
    split-sum (ops/packed.conv3x3_up2) and block1 packed."""
    up = ops.conv_transpose2x2(y, p["up"]["kernel"].astype(dtype),
                               p["up"]["bias"].astype(dtype))
    gated = _coord_att3(skip, up, p["cca"], s["cca"])
    w0, b0 = _fold(p["nConvs"]["block0"], s["nConvs"]["block0"])
    c = up.shape[-1]
    y_p = P.conv3x3_up2(
        up, P.expand_weights_up(w0[:, :, :c]).astype(dtype),
        gated, P.expand_weights_up(w0[:, :, c:]).astype(dtype),
        b0.astype(dtype), relu=True)
    return _cbn_pp(y_p, p["nConvs"]["block1"], s["nConvs"]["block1"], dtype)


def unet_forward_packed(variables: Dict[str, Any], x: jax.Array,
                        *, fused_up1: bool = False,
                        fused_up2: bool = False,
                        fused_up34: bool = False,
                        fused_down1: bool = False) -> jax.Array:
    """Engine forward with the 64-channel levels in pixel-packed layout.

    Numerically identical to `unet_forward` up to f32 summation order
    (tests/test_engine.py::TestPackedForward); measured 1.13x on the whole
    forward on the v5e, with the padded 64-lane levels providing the gains
    (benchmarks/RESULTS.md r2b). Requires an even image width.

    fused_up1=True additionally runs the up1+outc tail as the fused Pallas
    kernel; fused_up2=True does the same for the up2 level and fused_up34
    for up3+up4 (ops/pallas/up2.py: deconv -> CoordAtt3 gate -> split-sum
    pair -> block1, one VMEM residency per level). Serving graphs only; the
    dp-sharded runners keep them by tracing per-device programs under
    shard_map — parallel/mesh.py.
    """
    p = variables["params"]
    s = variables["batch_stats"]
    t = p["trunk"]
    ts = s["trunk"]
    dtype = x.dtype
    n, hh, ww, _ = x.shape

    # inc 3->64 directly into packed layout: RGB pairs pack to 6 channels
    x_p = x.reshape(n, hh, ww // 2, 6)
    x1_p = _cbn_pp(x_p, t["inc"], ts["inc"], dtype)

    # pool straight out of the packed layout into the dense 112^2 tensor
    # (rows-only reduce_window + lane-half max); down1 onward runs dense
    # each fused level gates on its kernel's *_supported predicate (not just
    # top-level evenness): an unsupported geometry must stay on the XLA path
    # rather than launch a kernel whose halo DMA would read out of bounds
    from unet_goolenet_tpu.ops.pallas.down1 import down1_supported
    from unet_goolenet_tpu.ops.pallas.up1 import up1_supported
    from unet_goolenet_tpu.ops.pallas.up2 import up_level_supported

    if fused_down1 and hh % 2 == 0 and down1_supported(hh // 2):
        from unet_goolenet_tpu.ops.pallas.down1 import fused_pool_down1
        d = t["down1"]["nConvs"]
        ds = ts["down1"]["nConvs"]
        w1, b1 = _fold(d["block0"], ds["block0"])
        w2, b2 = _fold(d["block1"], ds["block1"])
        h = fused_pool_down1(x1_p, w1, b1, w2, b2)
    else:
        h = P.max_pool2x2_p_to_dense(x1_p)
        h = _stack(h, t["down1"]["nConvs"], ts["down1"]["nConvs"])
    feats = [h]  # x2 (128ch @112^2)
    for i in range(2, 5):
        h = ops.max_pool2d(h, 2)
        h = _stack(h, t[f"down{i}"]["nConvs"], ts[f"down{i}"]["nConvs"])
        feats.append(h)

    _, out0 = _transformer(feats[3], feats[3], p["task2"], s["task2"])
    if (fused_up34 and hh % 2 == 0
            and up_level_supported(2 * out0.shape[1])
            and up_level_supported(4 * out0.shape[1])):
        y = _up_fused(out0, feats[2], p["up4"], s["up4"], dtype,
                      packed_out=False)
        y = _up_fused(y, feats[1], p["up3"], s["up3"], dtype,
                      packed_out=False)
    else:
        y = _up_alig(out0, feats[2], p["up4"], s["up4"])
        y = _up_alig(y, feats[1], p["up3"], s["up3"])

    # up2: cca runs at 128ch (dense); the two output convs emit packed 64ch
    if fused_up2 and hh % 2 == 0 and up_level_supported(2 * y.shape[1]):
        y_p = _up2_fused(y, feats[0], p["up2"], s["up2"], dtype)
    else:
        y_p = _up2_packed_xla(y, feats[0], p["up2"], s["up2"], dtype)

    # up1: fully packed (skip x1 never left packed layout)
    if fused_up1 and hh % 2 == 0 and up1_supported(2 * y_p.shape[1]):
        return P.unpack(unet_forward_packed_tail_fused(variables, y_p, x1_p,
                                                       dtype))
    y_p = _up_alig_p(y_p, x1_p, p["up1"], s["up1"], dtype)
    out_p = P.conv1x1_p(y_p, p["outc"]["conv"]["kernel"][0, 0],
                        p["outc"]["conv"]["bias"])
    return P.unpack(out_p)


def unet_forward(variables: Dict[str, Any], x: jax.Array,
                 *, fused_up1: bool = False, up2: str = "dense",
                 fused_up34: bool = False) -> jax.Array:
    """Engine forward of UNetTaskAligWeight: variables from model.init / the
    checkpoint converter; x (N, H, W, 3) -> logits (N, H, W, n_classes).

    fused_up1=True is the HYBRID forward: the dense graph (the measured
    batch>=128 winner, RESULTS.md queue 5/7) but with the up1+outc tail run
    as the packed fused Pallas kernel — pack()/unpack() at the boundary are
    layout-preserving reshapes (W*C == (W/2)*2C contiguous). Measured at the
    official batch 128 (queue 9): e2e 1325.6 vs plain-dense 1313.6 img/s
    (fused tail 25.97 ms vs dense up1 30.36 level-scale), so this is the
    TwoStagePipeline default on TPU for dense-branch batches; falls back to
    the dense tail on unsupported geometry.

    up2 moves the dense->packed switch point one level earlier (only
    meaningful with the fused_up1 tail, ignored otherwise): "dense" keeps
    the dense up2 (queue-9 hybrid), "packed" runs the all-XLA packed-output
    up2 (dense deconv+cca, split-sum packed emit — 15.89 ms at b128 vs
    19.14 dense, queue 9/7), "fused" the Pallas up2 kernel. The queue-5
    objection to fused up2 (it breaks XLA's cross-level fusion with up1's
    deconv) does not apply here: up1 is already a Pallas call."""
    p = variables["params"]
    s = variables["batch_stats"]
    t = p["trunk"]
    ts = s["trunk"]
    x1 = _cbn(x, t["inc"], ts["inc"])
    feats = [x1]
    h = x1
    for i in range(1, 5):
        h = ops.max_pool2d(h, 2)
        h = _stack(h, t[f"down{i}"]["nConvs"], ts[f"down{i}"]["nConvs"])
        feats.append(h)
    _, out0 = _transformer(feats[4], feats[4], p["task2"], s["task2"])
    up34_fused = False
    if fused_up34 and x.shape[2] % 2 == 0:
        from unet_goolenet_tpu.ops.pallas.up2 import up_level_supported
        up34_fused = (up_level_supported(2 * out0.shape[1])
                      and up_level_supported(4 * out0.shape[1]))
    if up34_fused:
        # dense fused decoder kernels in the dense/hybrid branch — runnable
        # on the real Mosaic backend since the sublane-alignment fix
        # (ops/pallas/up2.py; A/B knob BENCH_UP34, RESULTS.md queue 20)
        y = _up_fused(out0, feats[3], p["up4"], s["up4"], x.dtype,
                      packed_out=False)
        y = _up_fused(y, feats[2], p["up3"], s["up3"], x.dtype,
                      packed_out=False)
    else:
        y = _up_alig(out0, feats[3], p["up4"], s["up4"])
        y = _up_alig(y, feats[2], p["up3"], s["up3"])
    tail = False
    if fused_up1 and x.shape[2] % 2 == 0:
        from unet_goolenet_tpu.ops.pallas.up1 import up1_supported
        tail = up1_supported(x1.shape[1])
    if tail and up2 != "dense":
        from unet_goolenet_tpu.ops.pallas.up2 import up_level_supported
        if up2 == "fused" and up_level_supported(2 * y.shape[1]):
            y_p = _up2_fused(y, feats[1], p["up2"], s["up2"], x.dtype)
        elif up2 == "fused_dense" and up_level_supported(2 * y.shape[1]):
            # the VERDICT-r4 'fourth configuration': the up2 level as the
            # dense-OUT Pallas kernel (fused_up_dense, cq=64), pack at the
            # up1 boundary exactly where the winning hybrid packs — vs
            # 'fused' this moves the pack OUTSIDE the kernel wrapper (same
            # ops; lets XLA schedule the pack against the tail's consumers)
            y_d = _up_fused(y, feats[1], p["up2"], s["up2"], x.dtype,
                            packed_out=False)
            y_p = P.pack(y_d)
        else:
            y_p = _up2_packed_xla(y, feats[1], p["up2"], s["up2"], x.dtype)
        return P.unpack(unet_forward_packed_tail_fused(
            variables, y_p, P.pack(x1), x.dtype))
    y = _up_alig(y, feats[1], p["up2"], s["up2"])
    if tail:
        return P.unpack(unet_forward_packed_tail_fused(
            variables, P.pack(y), P.pack(x1), x.dtype))
    y = _up_alig(y, feats[0], p["up1"], s["up1"])
    return _conv1x1(y, p["outc"])
