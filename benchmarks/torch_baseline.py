"""PyTorch-CPU baseline for the end-to-end two-stage pipeline.

The reference itself cannot run in this image (it needs torchvision, monai and
pywt, none installed), so this is a minimal functional-torch reconstruction of its
inference compute path — same architecture, same per-image host flow (wavelet on
host, UNet per image inside the data path, bbox/crop on host, GoogLeNet per batch;
分类/test.py + 分类/util/roi.py) — used purely to measure reference-style CPU
images/sec as the `vs_baseline` denominator. Weights are random; throughput does
not depend on weight values.

Functional style on purpose: a flat dict of tensors and F.conv2d calls, no nn.Module
graph — this is a measurement harness, not a model implementation.
"""

from __future__ import annotations

import time
from typing import Dict, List, Tuple

import numpy as np
import torch
import torch.nn.functional as F

# No grads anywhere in this harness — but do NOT flip the global grad mode at
# import time: pytest imports this module during collection and a global
# set_grad_enabled(False) would silently break unrelated autograd tests.
# run_e2e_baseline wraps its body in torch.no_grad() instead.


# ------------------------------------------------------------------ param making

def _conv(p: Dict, name: str, cin: int, cout: int, k: int) -> None:
    p[f"{name}.w"] = torch.randn(cout, cin, k, k) * 0.05
    p[f"{name}.b"] = torch.zeros(cout)
    p[f"{name}.g"] = torch.ones(cout)
    p[f"{name}.be"] = torch.zeros(cout)
    p[f"{name}.m"] = torch.zeros(cout)
    p[f"{name}.v"] = torch.ones(cout)


def _lin(p: Dict, name: str, cin: int, cout: int) -> None:
    p[f"{name}.w"] = torch.randn(cout, cin) * 0.05
    p[f"{name}.b"] = torch.zeros(cout)


def _cbr(p: Dict, x: torch.Tensor, name: str, stride=1, pad=1) -> torch.Tensor:
    x = F.conv2d(x, p[f"{name}.w"], p[f"{name}.b"], stride=stride, padding=pad)
    x = F.batch_norm(x, p[f"{name}.m"], p[f"{name}.v"], p[f"{name}.g"],
                     p[f"{name}.be"], training=False)
    return F.relu(x)


# ------------------------------------------------------------------------- UNet

def make_unet_params() -> Dict:
    p: Dict = {}
    c = 64
    _conv(p, "inc", 3, c, 3)
    chans = [(c, 2 * c), (2 * c, 4 * c), (4 * c, 8 * c), (8 * c, 8 * c)]
    for i, (ci, co) in enumerate(chans):
        _conv(p, f"d{i}.0", ci, co, 3)
        _conv(p, f"d{i}.1", co, co, 3)
    # bottleneck transformer (dual stream, depth 1, heads 8, dim 512)
    d = 8 * c
    for s in ("cl", "seg"):
        _conv(p, f"t.conv_{s}", d, d, 3)
        p[f"t.pos_{s}"] = torch.zeros(1, d, 14, 14)
    for s in ("a1", "a2"):
        _lin(p, f"t.{s}.qkv", d, 3 * d)
        _lin(p, f"t.{s}.out", d, d)
    for nm in ("q", "k", "v"):
        _lin(p, f"t.cx.{nm}", d, d)
    _lin(p, "t.cx.out", d, d)
    for s in ("x", "m"):
        _lin(p, f"t.{s}.ff1", d, 2048)
        _lin(p, f"t.{s}.ff2", 2048, d)
        p[f"t.{s}.ln1"] = torch.ones(d)
        p[f"t.{s}.ln2"] = torch.ones(d)
    # decoder
    ups = [(8 * c, 4 * c), (4 * c, 2 * c), (2 * c, c), (c, c)]
    for i, (ci, co) in enumerate(ups):
        p[f"u{i}.up.w"] = torch.randn(ci, ci, 2, 2) * 0.05
        p[f"u{i}.up.b"] = torch.zeros(ci)
        _conv(p, f"u{i}.cca.c1", ci, ci, 3)
        _conv(p, f"u{i}.cca.c2", ci, ci, 3)
        _conv(p, f"u{i}.cca.fa", ci, ci // 2, 1)
        _conv(p, f"u{i}.cca.fm", ci, ci // 2, 1)
        _conv(p, f"u{i}.cca.fo", ci // 2, ci, 1)
        _conv(p, f"u{i}.c0", 2 * ci, co, 3)
        _conv(p, f"u{i}.c1", co, co, 3)
    _conv(p, "outc", c, 1, 1)
    return p


def _attn(p: Dict, x: torch.Tensor, name: str, d: int) -> torch.Tensor:
    qkv = x @ p[f"t.{name}.qkv.w"].T
    q, k, v = qkv.chunk(3, -1)
    b, n, _ = q.shape
    h = 8
    q, k, v = (t.view(b, n, h, d // h).transpose(1, 2) for t in (q, k, v))
    a = torch.softmax(q @ k.transpose(-1, -2) * d ** -0.5, -1)
    o = (a @ v).transpose(1, 2).reshape(b, n, d)
    return o @ p[f"t.{name}.out.w"].T + p[f"t.{name}.out.b"]


def _cross(p: Dict, x: torch.Tensor, m: torch.Tensor, d: int) -> torch.Tensor:
    q = x @ p["t.cx.q.w"].T
    k = m @ p["t.cx.k.w"].T
    v = m @ p["t.cx.v.w"].T
    b, n, _ = q.shape
    h = 8
    q, k, v = (t.view(b, -1, h, d // h).transpose(1, 2) for t in (q, k, v))
    a = torch.softmax(q @ k.transpose(-1, -2) * d ** -0.5, -1)
    o = (a @ v).transpose(1, 2).reshape(b, n, d)
    return o @ p["t.cx.out.w"].T + p["t.cx.out.b"]


def unet_forward(p: Dict, x: torch.Tensor) -> torch.Tensor:
    skips: List[torch.Tensor] = []
    x = _cbr(p, x, "inc")
    skips.append(x)
    for i in range(4):
        x = F.max_pool2d(x, 2)
        x = _cbr(p, x, f"d{i}.0")
        x = _cbr(p, x, f"d{i}.1")
        skips.append(x)
    # bottleneck
    d = x.shape[1]
    cl = _cbr(p, x, "t.conv_cl") + p["t.pos_cl"]
    sg = _cbr(p, x, "t.conv_seg") + p["t.pos_seg"]
    b, c, hh, ww = sg.shape
    cl = cl.flatten(2).transpose(1, 2)
    sg = sg.flatten(2).transpose(1, 2)
    cln = F.layer_norm(cl, (d,), p["t.x.ln1"])
    sgn = F.layer_norm(sg, (d,), p["t.m.ln1"])
    cl2 = _attn(p, cln, "a1", d) + _cross(p, cln, sgn, d) + cl
    sg2 = _attn(p, sgn, "a2", d) + _cross(p, sgn, cln, d) + sg
    for s, t in (("x", "cl2"), ("m", "sg2")):
        v = {"cl2": cl2, "sg2": sg2}[t]
        h = F.layer_norm(v, (d,), p[f"t.{s}.ln2"])
        h = F.gelu(h @ p[f"t.{s}.ff1.w"].T + p[f"t.{s}.ff1.b"])
        h = h @ p[f"t.{s}.ff2.w"].T + p[f"t.{s}.ff2.b"]
        if t == "cl2":
            cl2 = cl2 + h
        else:
            sg2 = sg2 + h
    x = sg2.transpose(1, 2).reshape(b, c, hh, ww)
    # decoder with CoordAtt3 gates
    for i in range(4):
        skip = skips[3 - i]
        up = F.conv_transpose2d(x, p[f"u{i}.up.w"], p[f"u{i}.up.b"], stride=2)
        e1 = _cbr(p, skip, f"u{i}.cca.c1")
        avg = e1.mean((2, 3), keepdim=True)
        mx = e1.amax((2, 3), keepdim=True)
        s = torch.sigmoid(F.conv2d(
            F.relu(F.conv2d(avg, p[f"u{i}.cca.fa.w"], p[f"u{i}.cca.fa.b"])) +
            F.relu(F.conv2d(mx, p[f"u{i}.cca.fm.w"], p[f"u{i}.cca.fm.b"])),
            p[f"u{i}.cca.fo.w"], p[f"u{i}.cca.fo.b"]))
        d2 = _cbr(p, up, f"u{i}.cca.c2")
        gated = e1 + s * d2 + d2
        x = torch.cat([up, gated], 1)
        x = _cbr(p, x, f"u{i}.c0")
        x = _cbr(p, x, f"u{i}.c1")
    return F.conv2d(x, p["outc.w"], p["outc.b"])


# --------------------------------------------------------------------- GoogLeNet

_INC = {
    "3a": (192, 64, 96, 128, 16, 32, 32),
    "3b": (256, 128, 128, 192, 32, 96, 64),
    "4a": (480, 192, 96, 208, 16, 48, 64),
    "4b": (512, 160, 112, 224, 24, 64, 64),
    "4c": (512, 128, 128, 256, 24, 64, 64),
    "4d": (512, 112, 144, 288, 32, 64, 64),
    "4e": (528, 256, 160, 320, 32, 128, 128),
    "5a": (832, 256, 160, 320, 32, 128, 128),
    "5b": (832, 384, 192, 384, 48, 128, 128),
}


def make_gnet_params(num_classes: int = 6) -> Dict:
    p: Dict = {}
    _conv(p, "c1", 3, 64, 7)
    _conv(p, "c2", 64, 64, 1)
    _conv(p, "c3", 64, 192, 3)
    for nm, (cin, b1, b2r, b2, b3r, b3, b4) in _INC.items():
        _conv(p, f"i{nm}.b1", cin, b1, 1)
        _conv(p, f"i{nm}.b2r", cin, b2r, 1)
        _conv(p, f"i{nm}.b2", b2r, b2, 3)
        _conv(p, f"i{nm}.b3r", cin, b3r, 1)
        _conv(p, f"i{nm}.b3", b3r, b3, 3)  # torchvision 3x3 quirk
        _conv(p, f"i{nm}.b4", cin, b4, 1)
    _lin(p, "fc", 1024, num_classes)
    return p


def _inception(p: Dict, x: torch.Tensor, nm: str) -> torch.Tensor:
    b1 = _cbr(p, x, f"i{nm}.b1", pad=0)
    b2 = _cbr(p, _cbr(p, x, f"i{nm}.b2r", pad=0), f"i{nm}.b2", pad=1)
    b3 = _cbr(p, _cbr(p, x, f"i{nm}.b3r", pad=0), f"i{nm}.b3", pad=1)
    b4 = _cbr(p, F.max_pool2d(x, 3, 1, 1, ceil_mode=True), f"i{nm}.b4", pad=0)
    return torch.cat([b1, b2, b3, b4], 1)


def gnet_forward(p: Dict, x: torch.Tensor) -> torch.Tensor:
    x = _cbr(p, x, "c1", stride=2, pad=3)
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    x = _cbr(p, x, "c2", pad=0)
    x = _cbr(p, x, "c3", pad=1)
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    x = _inception(p, x, "3a")
    x = _inception(p, x, "3b")
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    for nm in ("4a", "4b", "4c", "4d", "4e"):
        x = _inception(p, x, nm)
    x = F.max_pool2d(x, 2, 2, ceil_mode=True)
    x = _inception(p, x, "5a")
    x = _inception(p, x, "5b")
    x = x.mean((2, 3))
    return x @ p["fc.w"].T + p["fc.b"]


# -------------------------------------------------------------------- pipeline

def wavelet_enhance_np(gray: np.ndarray) -> np.ndarray:
    g = gray.astype(np.float32)
    h, w = g.shape
    gp = g
    if h % 2:
        gp = np.concatenate([gp, gp[-1:]], 0)
    if w % 2:
        gp = np.concatenate([gp, gp[:, -1:]], 1)
    blk = gp.reshape(gp.shape[0] // 2, 2, gp.shape[1] // 2, 2)
    a, b2, c, d = blk[:, 0, :, 0], blk[:, 0, :, 1], blk[:, 1, :, 0], blk[:, 1, :, 1]
    cA = (a + b2 + c + d) * 0.5
    hi = np.sqrt(((a + b2 - c - d) ** 2 + (a - b2 + c - d) ** 2 +
                  (a - b2 - c + d) ** 2) * 0.25)
    import cv2
    lo_up = cv2.resize(cA, (w, h))
    hi_up = cv2.resize(hi, (w, h))

    def norm(x):
        x = x - x.min()
        m = x.max()
        return (x / m * 255 if m else x).astype(np.uint8)

    return np.stack([norm(g), norm(lo_up), norm(hi_up)], 0)


def run_e2e_baseline(
    n_images: int = 16, image_hw: Tuple[int, int] = (400, 500), img_size: int = 224,
) -> float:
    """Reference-style flow: per-image host preprocessing + per-image UNet (as in
    TestImageDataset.__getitem__), batched GoogLeNet. Returns images/sec."""
    import cv2

    with torch.no_grad():
        return _run_e2e_baseline(n_images, image_hw, img_size, cv2)


def _run_e2e_baseline(n_images, image_hw, img_size, cv2) -> float:
    up = make_unet_params()
    gp = make_gnet_params()
    rng = np.random.default_rng(0)
    grays = [
        (rng.random(image_hw) * 255).astype(np.uint8) for _ in range(n_images)
    ]
    # warmup one image through both nets
    warm = torch.zeros(1, 3, img_size, img_size)
    unet_forward(up, warm)
    gnet_forward(gp, warm)

    t0 = time.perf_counter()
    crops = []
    for g in grays:
        rgb = wavelet_enhance_np(g)  # (3, H, W)
        img = np.transpose(rgb, (1, 2, 0))
        img = cv2.resize(img, (img_size, img_size)).astype(np.float32) / 255.0
        t = torch.from_numpy(img).permute(2, 0, 1)[None]
        logits = unet_forward(up, t)
        mask = (torch.sigmoid(logits) > 0.5).squeeze().numpy().astype(np.uint8)
        ys, xs = np.where(mask == 1)
        h, w = mask.shape
        if len(xs) == 0:
            cx, cy, size = w // 2, h // 2, min(h, w) // 2
            x0, x1, y0, y1 = cx - size // 2, cx + size // 2, cy - size // 2, cy + size // 2
        else:
            x0, x1 = max(xs.min() - 30, 0), min(xs.max() + 30, w)
            y0, y1 = max(ys.min() - 30, 0), min(ys.max() + 30, h)
        roi = t[0, :, y0:y1, x0:x1].permute(1, 2, 0).numpy()
        roi = (roi * 255).astype(np.uint8)[..., ::-1]  # BGR2RGB swap
        roi = cv2.resize(roi, (img_size, img_size)).astype(np.float32) / 255.0
        crops.append(torch.from_numpy(roi).permute(2, 0, 1))
    batch = torch.stack(crops)
    cls = gnet_forward(gp, batch)
    _ = torch.argmax(cls, 1).numpy()
    dt = time.perf_counter() - t0
    return n_images / dt


# ----------------------------------------------------- reference-named forwards
#
# Torch forwards that consume a REFERENCE-NAMED state dict (the exact parameter
# names torch emits for 分割/nets/basicUnet.py:369-437 / tasks.py:149-231 and the
# torchvision googlenet under 分类/ROI_main.py:86-95's 'googlenet.' prefix).
# These are the independent oracle for model-forward parity tests: the same state
# dict goes through (a) these, (b) models.convert -> flax apply, and (c) the
# pipeline engine; logits must agree. Written from the reference semantics, NOT
# from the flax code.


def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a))


def _sd_cbn(sd: Dict, name: str, x: torch.Tensor, *, pad: int = 1,
            eps: float = 1e-5) -> torch.Tensor:
    """ConvBatchNorm (basicUnet.py:25-40): conv3x3(p1) + BN + ReLU, eval mode."""
    x = F.conv2d(x, _t(sd[f"{name}.conv.weight"]), _t(sd[f"{name}.conv.bias"]),
                 padding=pad)
    x = F.batch_norm(x, _t(sd[f"{name}.norm.running_mean"]),
                     _t(sd[f"{name}.norm.running_var"]),
                     _t(sd[f"{name}.norm.weight"]), _t(sd[f"{name}.norm.bias"]),
                     training=False, eps=eps)
    return F.relu(x)


def _sd_attn(sd: Dict, prefix: str, x: torch.Tensor, m: torch.Tensor = None,
             *, dim: int = 512, heads: int = 8) -> torch.Tensor:
    """Self-attention (m is None; fused to_qkv) or cross-attention (q from x,
    k/v from m; separate to_q/to_k/to_v). Scale is dim**-0.5 — the reference's
    quirk (tasks.py:63,126), not dim_head**-0.5."""
    if m is None:
        qkv = x @ _t(sd[f"{prefix}.to_qkv.weight"]).T
        q, k, v = qkv.chunk(3, -1)
    else:
        q = x @ _t(sd[f"{prefix}.to_q.weight"]).T
        k = m @ _t(sd[f"{prefix}.to_k.weight"]).T
        v = m @ _t(sd[f"{prefix}.to_v.weight"]).T
    b, n, hd = q.shape
    d = hd // heads
    q, k, v = (t.view(b, -1, heads, d).transpose(1, 2) for t in (q, k, v))
    a = torch.softmax(q @ k.transpose(-1, -2) * dim ** -0.5, -1)
    o = (a @ v).transpose(1, 2).reshape(b, n, hd)
    return o @ _t(sd[f"{prefix}.to_out.0.weight"]).T + _t(sd[f"{prefix}.to_out.0.bias"])


def _sd_ln(sd: Dict, name: str, x: torch.Tensor) -> torch.Tensor:
    return F.layer_norm(x, (x.shape[-1],), _t(sd[f"{name}.weight"]),
                        _t(sd[f"{name}.bias"]), eps=1e-5)


def _sd_feed(sd: Dict, prefix: str, x: torch.Tensor) -> torch.Tensor:
    """FeedForward (tasks.py:46-57): Linear -> exact GELU -> Linear."""
    h = x @ _t(sd[f"{prefix}.net.0.weight"]).T + _t(sd[f"{prefix}.net.0.bias"])
    h = F.gelu(h)
    return h @ _t(sd[f"{prefix}.net.3.weight"]).T + _t(sd[f"{prefix}.net.3.bias"])


def _sd_transformer(sd: Dict, x5: torch.Tensor, *, dim: int = 512) -> torch.Tensor:
    """TransformerDecoder bottleneck (tasks.py:188-231), returning the seg
    stream only (the flagship discards the cl stream)."""
    return _sd_transformer_both(sd, x5, dim=dim)[1]


def _sd_transformer_both(sd: Dict, x5: torch.Tensor, *, dim: int = 512):
    """TransformerDecoder bottleneck (tasks.py:188-231), returning
    (cl stream, seg stream) as (N, dim, H, W) maps — the variants' live order.
    Both cross-attention directions share cross_attention_cl (tasks.py:174-175)."""
    def proj(stream):
        t = F.conv2d(x5, _t(sd[f"task2.conv_{stream}.0.weight"]), None, padding=1)
        t = F.batch_norm(t, _t(sd[f"task2.conv_{stream}.1.running_mean"]),
                         _t(sd[f"task2.conv_{stream}.1.running_var"]),
                         _t(sd[f"task2.conv_{stream}.1.weight"]),
                         _t(sd[f"task2.conv_{stream}.1.bias"]),
                         training=False, eps=1e-5)
        t = F.relu(t)
        return t + _t(sd[f"task2.pos_embedding_decoder_{stream}"])

    b, c, hh, ww = x5.shape
    x = proj("cl").flatten(2).transpose(1, 2)
    m = proj("seg").flatten(2).transpose(1, 2)
    lp = "task2.layers.0"
    x_n = _sd_ln(sd, f"{lp}.x_att_norm", x)
    m_n = _sd_ln(sd, f"{lp}.m_att_norm", m)
    x_att = _sd_attn(sd, f"{lp}.attention1", x_n, dim=dim)
    m_att = _sd_attn(sd, f"{lp}.attention2", m_n, dim=dim)
    x_cross = _sd_attn(sd, f"{lp}.cross_attention_cl", x_n, m_n, dim=dim)
    m_cross = _sd_attn(sd, f"{lp}.cross_attention_cl", m_n, x_n, dim=dim)
    x_mid = x_att + x_cross + x
    m_mid = m_att + m_cross + m
    m_out = m_mid + _sd_feed(sd, f"{lp}.m_feed",
                             _sd_ln(sd, f"{lp}.m_mlp_norm", m_mid))
    x_out = x_mid + _sd_feed(sd, f"{lp}.x_feed",
                             _sd_ln(sd, f"{lp}.x_mlp_norm", x_mid))
    return (x_out.transpose(1, 2).reshape(b, dim, hh, ww),
            m_out.transpose(1, 2).reshape(b, dim, hh, ww))


def _sd_coord_att3(sd: Dict, prefix: str, e: torch.Tensor,
                   d: torch.Tensor) -> torch.Tensor:
    """CoordAtt3 gate (basicUnet.py:201-231): e=encoder skip, d=decoder up."""
    e1 = _sd_cbn(sd, f"{prefix}.conv1_e.0", e)
    avg = e1.mean((2, 3), keepdim=True)
    mx = e1.amax((2, 3), keepdim=True)
    s = torch.sigmoid(F.conv2d(
        F.relu(F.conv2d(avg, _t(sd[f"{prefix}.fc_avg.weight"]),
                        _t(sd[f"{prefix}.fc_avg.bias"]))) +
        F.relu(F.conv2d(mx, _t(sd[f"{prefix}.fc_max.weight"]),
                        _t(sd[f"{prefix}.fc_max.bias"]))),
        _t(sd[f"{prefix}.fc_avg_max_sfot.weight"]),
        _t(sd[f"{prefix}.fc_avg_max_sfot.bias"])))
    d2 = _sd_cbn(sd, f"{prefix}.conv2_e.0", d)
    return e1 + s * d2 + d2


def unet_forward_ref(sd: Dict, x: torch.Tensor) -> torch.Tensor:
    """UNetTaskAligWeight forward (basicUnet.py:369-437) from a reference-named
    state dict. x: (N, 3, H, W); returns (N, 1, H, W) seg logits."""
    x1 = _sd_cbn(sd, "inc", x)
    skips = [x1]
    h = x1
    for i in range(1, 5):
        h = F.max_pool2d(h, 2)
        h = _sd_cbn(sd, f"down{i}.nConvs.0", h)
        h = _sd_cbn(sd, f"down{i}.nConvs.1", h)
        skips.append(h)
    h = _sd_transformer(sd, skips[4])
    for i, skip in zip((4, 3, 2, 1), (skips[3], skips[2], skips[1], skips[0])):
        up = F.conv_transpose2d(h, _t(sd[f"up{i}.up.weight"]),
                                _t(sd[f"up{i}.up.bias"]), stride=2)
        gated = _sd_coord_att3(sd, f"up{i}.cca", skip, up)
        h = torch.cat([up, gated], 1)
        h = _sd_cbn(sd, f"up{i}.nConvs.0", h)
        h = _sd_cbn(sd, f"up{i}.nConvs.1", h)
    return F.conv2d(h, _t(sd["outc.weight"]), _t(sd["outc.bias"]))


def unet_variant_forward_ref(sd: Dict, x: torch.Tensor, *, task2: bool,
                             alig: bool):
    """UNetBasic / UNetTask / UNetTaskAlig forward (basicUnet.py:133-368) from
    a reference-named state dict. x: (N, 3, H, W); returns (seg logits, cl_out)
    — unlike the flagship, the (avgpool -> fc1 -> fc2) scalar head is live.

    task2=False, alig=False -> UNetBasic  (cl head pools the down4 output,
                                           basicUnet.py:184-196)
    task2=True,  alig=False -> UNetTask   (cl head pools the transformer's cl
                                           stream, basicUnet.py:292-299)
    task2=True,  alig=True  -> UNetTaskAlig (same + CoordAtt3 skips)
    """
    x1 = _sd_cbn(sd, "inc", x)
    skips = [x1]
    h = x1
    for i in range(1, 5):
        h = F.max_pool2d(h, 2)
        h = _sd_cbn(sd, f"down{i}.nConvs.0", h)
        h = _sd_cbn(sd, f"down{i}.nConvs.1", h)
        skips.append(h)
    if task2:
        cl_feat, h = _sd_transformer_both(sd, skips[4])
    else:
        cl_feat, h = skips[4], skips[4]
    cl = cl_feat.mean((2, 3))  # AdaptiveAvgPool2d((1,1)) + flatten
    cl = cl @ _t(sd["fc1.weight"]).T + _t(sd["fc1.bias"])
    cl = cl @ _t(sd["fc2.weight"]).T + _t(sd["fc2.bias"])
    for i, skip in zip((4, 3, 2, 1), (skips[3], skips[2], skips[1], skips[0])):
        up = F.conv_transpose2d(h, _t(sd[f"up{i}.up.weight"]),
                                _t(sd[f"up{i}.up.bias"]), stride=2)
        tail = _sd_coord_att3(sd, f"up{i}.cca", skip, up) if alig else skip
        h = torch.cat([up, tail], 1)
        h = _sd_cbn(sd, f"up{i}.nConvs.0", h)
        h = _sd_cbn(sd, f"up{i}.nConvs.1", h)
    return F.conv2d(h, _t(sd["outc.weight"]), _t(sd["outc.bias"])), cl


def _sd_basic(sd: Dict, name: str, x: torch.Tensor, *, stride: int = 1,
              pad: int = 0) -> torch.Tensor:
    """torchvision BasicConv2d: conv(bias=False) + BN(eps=1e-3) + ReLU."""
    x = F.conv2d(x, _t(sd[f"{name}.conv.weight"]), None, stride=stride, padding=pad)
    x = F.batch_norm(x, _t(sd[f"{name}.bn.running_mean"]),
                     _t(sd[f"{name}.bn.running_var"]),
                     _t(sd[f"{name}.bn.weight"]), _t(sd[f"{name}.bn.bias"]),
                     training=False, eps=1e-3)
    return F.relu(x)


def _sd_inception(sd: Dict, name: str, x: torch.Tensor) -> torch.Tensor:
    b1 = _sd_basic(sd, f"{name}.branch1", x)
    b2 = _sd_basic(sd, f"{name}.branch2.1",
                   _sd_basic(sd, f"{name}.branch2.0", x), pad=1)
    b3 = _sd_basic(sd, f"{name}.branch3.1",
                   _sd_basic(sd, f"{name}.branch3.0", x), pad=1)  # 3x3 quirk
    b4 = _sd_basic(sd, f"{name}.branch4.1",
                   F.max_pool2d(x, 3, 1, 1, ceil_mode=True))
    return torch.cat([b1, b2, b3, b4], 1)


def gnet_forward_ref(sd: Dict, x: torch.Tensor,
                     *, prefix: str = "googlenet.") -> torch.Tensor:
    """torchvision GoogLeNet forward (transform_input=True, aux heads stripped)
    from a reference-named state dict. x: (N, 3, H, W); returns (N, classes)."""
    p = prefix.rstrip(".")
    r = x[:, 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
    g = x[:, 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
    b = x[:, 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
    x = torch.cat([r, g, b], 1)
    x = _sd_basic(sd, f"{p}.conv1", x, stride=2, pad=3)
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    x = _sd_basic(sd, f"{p}.conv2", x)
    x = _sd_basic(sd, f"{p}.conv3", x, pad=1)
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    x = _sd_inception(sd, f"{p}.inception3a", x)
    x = _sd_inception(sd, f"{p}.inception3b", x)
    x = F.max_pool2d(x, 3, 2, ceil_mode=True)
    for nm in ("4a", "4b", "4c", "4d", "4e"):
        x = _sd_inception(sd, f"{p}.inception{nm}", x)
    x = F.max_pool2d(x, 2, 2, ceil_mode=True)
    x = _sd_inception(sd, f"{p}.inception5a", x)
    x = _sd_inception(sd, f"{p}.inception5b", x)
    x = x.mean((2, 3))
    return x @ _t(sd[f"{p}.fc.weight"]).T + _t(sd[f"{p}.fc.bias"])


if __name__ == "__main__":
    ips = run_e2e_baseline()
    print(f"torch-CPU reference-style e2e: {ips:.3f} images/sec")
