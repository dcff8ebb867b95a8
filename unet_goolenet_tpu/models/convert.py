"""PyTorch-checkpoint -> flax-variables converter (SURVEY.md §5: needed for
bit-parity Dice/top-1 testing against the reference's trained .pt files).

Handles the two production models:
  * UNetTaskAligWeight (分割/nets/basicUnet.py:369-437) — including dropping the
    reference's declared-but-never-used parameters (fc1/fc2, CoordAtt3's
    DeformConv2d, the transformer's cross_attention_seg; SURVEY.md §7 'reference
    quirks') and ignoring num_batches_tracked.
  * GoogLeNetClassifier (分类/ROI_main.py:86-95) — torchvision googlenet naming.

Layout conversions:
  conv   (O,I,kh,kw) -> HWIO (kh,kw,I,O)
  linear (O,I)       -> (I,O)
  deconv (I,O,kh,kw) -> (kh,kw,I,O)
  BN weight/bias/running_mean/running_var -> scale/bias + batch_stats mean/var
  pos embeddings (1,C,H,W) -> (1,H,W,C)

Input is a flat dict of numpy arrays (use `load_torch_state_dict` for .pt files).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load the reference's torch checkpoint ({'net': state_dict, ...}) into
    numpy. Requires torch (cpu) at call time only."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload["net"] if isinstance(payload, dict) and "net" in payload else payload
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


# ------------------------------------------------------------------- primitives

def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _deconv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 0, 1))


def _lin_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def _pos(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (0, 2, 3, 1))


class _TreeBuilder:
    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.params: Dict[str, Any] = {}
        self.stats: Dict[str, Any] = {}
        self.used: set = set()

    def _set(self, tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def take(self, key: str) -> np.ndarray:
        self.used.add(key)
        return self.sd[key]

    def conv(self, tkey: str, *path: str, bias: bool = True) -> None:
        self._set(self.params, path + ("kernel",), _conv_w(self.take(f"{tkey}.weight")))
        if bias:
            self._set(self.params, path + ("bias",), self.take(f"{tkey}.bias"))

    def linear(self, tkey: str, *path: str, bias: bool = True) -> None:
        self._set(self.params, path + ("kernel",), _lin_w(self.take(f"{tkey}.weight")))
        if bias:
            self._set(self.params, path + ("bias",), self.take(f"{tkey}.bias"))

    def bn(self, tkey: str, *path: str) -> None:
        self._set(self.params, path + ("scale",), self.take(f"{tkey}.weight"))
        self._set(self.params, path + ("bias",), self.take(f"{tkey}.bias"))
        self._set(self.stats, path + ("mean",), self.take(f"{tkey}.running_mean"))
        self._set(self.stats, path + ("var",), self.take(f"{tkey}.running_var"))
        self.used.add(f"{tkey}.num_batches_tracked")  # present in torch, ignored

    def deconv(self, tkey: str, *path: str) -> None:
        self._set(self.params, path + ("kernel",), _deconv_w(self.take(f"{tkey}.weight")))
        self._set(self.params, path + ("bias",), self.take(f"{tkey}.bias"))

    def raw(self, tkey: str, transform, *path: str) -> None:
        self._set(self.params, path, transform(self.take(tkey)))

    def unused(self) -> set:
        return {k for k in self.sd if k not in self.used}


# ---------------------------------------------------------------------- UNet

def _convert_conv_batch_norm(b: _TreeBuilder, tprefix: str, *path: str) -> None:
    """torch ConvBatchNorm 'x.conv' + 'x.norm' -> ours path/{conv/conv, norm}."""
    b.conv(f"{tprefix}.conv", *path, "conv", "conv")
    b.bn(f"{tprefix}.norm", *path, "norm")


def _convert_conv_stack(b: _TreeBuilder, tprefix: str, n: int, *path: str) -> None:
    """torch _make_nConv Sequential 'x.0', 'x.1' -> ours path/block{i}."""
    for i in range(n):
        _convert_conv_batch_norm(b, f"{tprefix}.{i}", *path, f"block{i}")


def _convert_attention(b: _TreeBuilder, tprefix: str, *path: str) -> None:
    b.linear(f"{tprefix}.to_qkv", *path, "to_qkv", bias=False)
    b.linear(f"{tprefix}.to_out.0", *path, "to_out")


def _convert_cross_attention(b: _TreeBuilder, tprefix: str, *path: str) -> None:
    for nm in ("to_q", "to_k", "to_v"):
        b.linear(f"{tprefix}.{nm}", *path, nm, bias=False)
    b.linear(f"{tprefix}.to_out.0", *path, "to_out")


def _convert_layernorm(b: _TreeBuilder, tkey: str, *path: str) -> None:
    b._set(b.params, path + ("scale",), b.take(f"{tkey}.weight"))
    b._set(b.params, path + ("bias",), b.take(f"{tkey}.bias"))


def _convert_feedforward(b: _TreeBuilder, tprefix: str, *path: str) -> None:
    b.linear(f"{tprefix}.net.0", *path, "fc1")
    b.linear(f"{tprefix}.net.3", *path, "fc2")


def _convert_transformer(b: _TreeBuilder, tprefix: str, depth: int, *path: str) -> None:
    # Conv2dReLU = Sequential(conv(0, no bias), bn(1), relu)
    for stream in ("cl", "seg"):
        b.conv(f"{tprefix}.conv_{stream}.0", *path, f"conv_{stream}_conv", "conv",
               bias=False)
        b.bn(f"{tprefix}.conv_{stream}.1", *path, f"conv_{stream}_bn")
    b.raw(f"{tprefix}.pos_embedding_decoder_cl", _pos, *path, "pos_embedding_cl")
    b.raw(f"{tprefix}.pos_embedding_decoder_seg", _pos, *path, "pos_embedding_seg")
    for k in range(depth):
        lp = f"{tprefix}.layers.{k}"
        op = path + (f"layer{k}",)
        _convert_attention(b, f"{lp}.attention1", *op, "attention1")
        _convert_attention(b, f"{lp}.attention2", *op, "attention2")
        _convert_cross_attention(b, f"{lp}.cross_attention_cl", *op, "cross_attention_cl")
        # cross_attention_seg: declared, never called (tasks.py:174-175) — dropped
        for nm in ("x_att_norm", "m_att_norm", "x_mlp_norm", "m_mlp_norm"):
            _convert_layernorm(b, f"{lp}.{nm}", *op, nm)
        _convert_feedforward(b, f"{lp}.x_feed", *op, "x_feed")
        _convert_feedforward(b, f"{lp}.m_feed", *op, "m_feed")


def _convert_coord_att3(b: _TreeBuilder, tprefix: str, *path: str) -> None:
    _convert_conv_stack(b, f"{tprefix}.conv1_e", 1, *path, "conv1_e")
    _convert_conv_stack(b, f"{tprefix}.conv2_e", 1, *path, "conv2_e")
    b.conv(f"{tprefix}.fc_avg", *path, "fc_avg", "conv")
    b.conv(f"{tprefix}.fc_max", *path, "fc_max", "conv")
    b.conv(f"{tprefix}.fc_avg_max_sfot", *path, "fc_out", "conv")
    # deformabel.*: declared, never called (basicUnet.py:213) — dropped


def convert_unet_task_alig_weight(
    sd: Dict[str, np.ndarray]
) -> Tuple[Dict[str, Any], Dict[str, Any], set]:
    """Returns (params, batch_stats, unconverted_reference_keys)."""
    b = _TreeBuilder(sd)
    _convert_conv_batch_norm(b, "inc", "trunk", "inc")
    for i in range(1, 5):
        _convert_conv_stack(b, f"down{i}.nConvs", 2, "trunk", f"down{i}", "nConvs")
    _convert_transformer(b, "task2", 1, "task2")
    for i in range(1, 5):
        b.deconv(f"up{i}.up", f"up{i}", "up")
        _convert_coord_att3(b, f"up{i}.cca", f"up{i}", "cca")
        _convert_conv_stack(b, f"up{i}.nConvs", 2, f"up{i}", "nConvs")
    b.conv("outc", "outc", "conv")
    # fc1/fc2: declared, never called in UNetTaskAligWeight.forward — dropped
    for k in ("fc1.weight", "fc1.bias", "fc2.weight", "fc2.bias"):
        b.used.add(k)
    return b.params, b.stats, b.unused()


def _convert_unet_variant(
    sd: Dict[str, np.ndarray], *, task2: bool, alig: bool
) -> Tuple[Dict[str, Any], Dict[str, Any], set]:
    """Shared converter for the non-flagship UNet variants
    (分割/nets/basicUnet.py:133-368). Unlike the flagship, their fc1/fc2
    scalar-classification heads are LIVE (basicUnet.py:193-196, 296-299,
    360-363) and convert to the models' top-level fc1/fc2 Dense params."""
    b = _TreeBuilder(sd)
    _convert_conv_batch_norm(b, "inc", "trunk", "inc")
    for i in range(1, 5):
        _convert_conv_stack(b, f"down{i}.nConvs", 2, "trunk", f"down{i}", "nConvs")
    if task2:
        _convert_transformer(b, "task2", 1, "task2")
    for i in range(1, 5):
        b.deconv(f"up{i}.up", f"up{i}", "up")
        if alig:
            _convert_coord_att3(b, f"up{i}.cca", f"up{i}", "cca")
        _convert_conv_stack(b, f"up{i}.nConvs", 2, f"up{i}", "nConvs")
    b.conv("outc", "outc", "conv")
    b.linear("fc1", "fc1")
    b.linear("fc2", "fc2")
    # UNetTask declares AutomaticWeightedLoss(num=2) as a submodule
    # (basicUnet.py:271) so its sigma params land in checkpoints; the loss is
    # never stepped through it — dropped
    b.used.add("loss_function.params")
    return b.params, b.stats, b.unused()


def convert_unet_basic(sd: Dict[str, np.ndarray]):
    """UNetBasic (basicUnet.py:133-200): plain UpBlocks, no bottleneck,
    live (avgpool -> fc1 -> fc2) scalar head."""
    return _convert_unet_variant(sd, task2=False, alig=False)


def convert_unet_task(sd: Dict[str, np.ndarray]):
    """UNetTask (basicUnet.py:237-304): + TransformerDecoder bottleneck."""
    return _convert_unet_variant(sd, task2=True, alig=False)


def convert_unet_task_alig(sd: Dict[str, np.ndarray]):
    """UNetTaskAlig (basicUnet.py:305-368): + CoordAtt3-gated skips."""
    return _convert_unet_variant(sd, task2=True, alig=True)


# ------------------------------------------------------------------- GoogLeNet

_GOOGLENET_INCEPTIONS = [
    "inception3a", "inception3b", "inception4a", "inception4b", "inception4c",
    "inception4d", "inception4e", "inception5a", "inception5b",
]


def _convert_basic_conv(b: _TreeBuilder, tprefix: str, *path: str) -> None:
    b.conv(f"{tprefix}.conv", *path, "conv", "conv", bias=False)
    b.bn(f"{tprefix}.bn", *path, "bn")


def convert_googlenet_classifier(
    sd: Dict[str, np.ndarray], *, prefix: str = "googlenet.", aux: bool = False
) -> Tuple[Dict[str, Any], Dict[str, Any], set]:
    """torchvision googlenet naming (the reference wraps it under 'googlenet.')."""
    b = _TreeBuilder(sd)
    g = ("googlenet",)
    for nm in ("conv1", "conv2", "conv3"):
        _convert_basic_conv(b, f"{prefix}{nm}", *g, nm)
    for inc in _GOOGLENET_INCEPTIONS:
        _convert_basic_conv(b, f"{prefix}{inc}.branch1", *g, inc, "branch1")
        _convert_basic_conv(b, f"{prefix}{inc}.branch2.0", *g, inc, "branch2_0")
        _convert_basic_conv(b, f"{prefix}{inc}.branch2.1", *g, inc, "branch2_1")
        _convert_basic_conv(b, f"{prefix}{inc}.branch3.0", *g, inc, "branch3_0")
        _convert_basic_conv(b, f"{prefix}{inc}.branch3.1", *g, inc, "branch3_1")
        _convert_basic_conv(b, f"{prefix}{inc}.branch4.1", *g, inc, "branch4_1")
    if aux:
        for anm in ("aux1", "aux2"):
            _convert_basic_conv(b, f"{prefix}{anm}.conv", *g, anm, "conv")
            b.linear(f"{prefix}{anm}.fc1", *g, anm, "fc1")
            b.linear(f"{prefix}{anm}.fc2", *g, anm, "fc2")
    b.linear(f"{prefix}fc", *g, "fc")
    return b.params, b.stats, b.unused()


def as_variables(params: Dict, stats: Dict) -> Dict[str, Any]:
    import jax.numpy as jnp
    import jax

    to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}
