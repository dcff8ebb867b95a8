"""Checkpoint-converter tests: synthesize a torch-style state dict with the
reference's exact parameter names/shapes, convert, and verify the result is
structurally identical to model.init's variables (so apply() accepts it)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unet_goolenet_tpu.models import UNetTaskAligWeight, GoogLeNetClassifier
from unet_goolenet_tpu.models.convert import (
    convert_unet_task_alig_weight,
    convert_googlenet_classifier,
    as_variables,
)

KEY = jax.random.PRNGKey(0)


def synth_unet_state_dict() -> dict:
    """Parameter names exactly as torch emits them for the reference model
    (分割/nets/basicUnet.py:369-437 + tasks.py + deform_conv_v2.py)."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, ci, co, k, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal((co, ci, k, k)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal(co).astype(np.float32)

    def bn(name, c):
        for suffix, val in (("weight", np.ones(c)), ("bias", np.zeros(c)),
                            ("running_mean", np.zeros(c)),
                            ("running_var", np.ones(c))):
            sd[f"{name}.{suffix}"] = val.astype(np.float32)
        sd[f"{name}.num_batches_tracked"] = np.asarray(0)

    def cbn(name, ci, co):
        conv(f"{name}.conv", ci, co, 3)
        bn(f"{name}.norm", co)

    def lin(name, ci, co, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal((co, ci)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal(co).astype(np.float32)

    c = 64
    cbn("inc", 3, c)
    chans = [(c, 2 * c), (2 * c, 4 * c), (4 * c, 8 * c), (8 * c, 8 * c)]
    for i, (ci, co) in enumerate(chans, start=1):
        cbn(f"down{i}.nConvs.0", ci, co)
        cbn(f"down{i}.nConvs.1", co, co)
    d = 8 * c
    for s in ("cl", "seg"):
        conv(f"task2.conv_{s}.0", d, d, 3, bias=False)
        bn(f"task2.conv_{s}.1", d)
        sd[f"task2.pos_embedding_decoder_{s}"] = np.zeros((1, d, 14, 14), np.float32)
    for att in ("attention1", "attention2"):
        lin(f"task2.layers.0.{att}.to_qkv", d, 3 * 512, bias=False)
        lin(f"task2.layers.0.{att}.to_out.0", 512, d)
    for ca in ("cross_attention_cl", "cross_attention_seg"):
        for nm in ("to_q", "to_k", "to_v"):
            lin(f"task2.layers.0.{ca}.{nm}", d, 512, bias=False)
        lin(f"task2.layers.0.{ca}.to_out.0", 512, d)
    for nm in ("x_att_norm", "m_att_norm", "x_mlp_norm", "m_mlp_norm"):
        sd[f"task2.layers.0.{nm}.weight"] = np.ones(d, np.float32)
        sd[f"task2.layers.0.{nm}.bias"] = np.zeros(d, np.float32)
    for s in ("x_feed", "m_feed"):
        lin(f"task2.layers.0.{s}.net.0", d, 2048)
        lin(f"task2.layers.0.{s}.net.3", 2048, d)
    ups = [(8 * c, 4 * c), (4 * c, 2 * c), (2 * c, c), (c, c)]
    for i, (ci, co) in enumerate(ups, start=1):
        j = 5 - i  # up4..up1 with decreasing channels
        pass
    for idx, (ci, co) in zip((4, 3, 2, 1), ups):
        sd[f"up{idx}.up.weight"] = rng.standard_normal((ci, ci, 2, 2)).astype(np.float32)
        sd[f"up{idx}.up.bias"] = rng.standard_normal(ci).astype(np.float32)
        cbn(f"up{idx}.cca.conv1_e.0", ci, ci)
        cbn(f"up{idx}.cca.conv2_e.0", ci, ci)
        conv(f"up{idx}.cca.fc_avg", ci, ci // 2, 1)
        conv(f"up{idx}.cca.fc_max", ci, ci // 2, 1)
        conv(f"up{idx}.cca.fc_avg_max_sfot", ci // 2, ci, 1)
        # the dead DeformConv2d params present in real checkpoints
        conv(f"up{idx}.cca.deformabel.offset_conv", ci, 18, 3)
        conv(f"up{idx}.cca.deformabel.regular_conv", ci, ci, 3)
        sd[f"up{idx}.cca.deformabel.bias"] = np.zeros(ci, np.float32)
        cbn(f"up{idx}.nConvs.0", 2 * ci, co)
        cbn(f"up{idx}.nConvs.1", co, co)
    conv("outc", c, 1, 1)
    lin("fc1", 8 * c, 4 * c)
    lin("fc2", 4 * c, 1)
    return sd


def synth_unet_variant_state_dict(*, task2: bool, alig: bool) -> dict:
    """Reference-named state dict for UNetBasic/UNetTask/UNetTaskAlig
    (分割/nets/basicUnet.py:133-368): like the flagship but with LIVE fc1/fc2
    heads, optional task2, and plain UpBlocks when alig=False."""
    rng = np.random.default_rng(3)
    sd = {}

    def conv(name, ci, co, k, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal((co, ci, k, k)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal(co).astype(np.float32)

    def bn(name, c):
        for suffix, val in (("weight", np.ones(c)), ("bias", np.zeros(c)),
                            ("running_mean", np.zeros(c)),
                            ("running_var", np.ones(c))):
            sd[f"{name}.{suffix}"] = val.astype(np.float32)
        sd[f"{name}.num_batches_tracked"] = np.asarray(0)

    def cbn(name, ci, co):
        conv(f"{name}.conv", ci, co, 3)
        bn(f"{name}.norm", co)

    def lin(name, ci, co, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal((co, ci)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal(co).astype(np.float32)

    c = 64
    cbn("inc", 3, c)
    for i, (ci, co) in enumerate(
            [(c, 2 * c), (2 * c, 4 * c), (4 * c, 8 * c), (8 * c, 8 * c)], start=1):
        cbn(f"down{i}.nConvs.0", ci, co)
        cbn(f"down{i}.nConvs.1", co, co)
    if task2:
        d = 8 * c
        for s in ("cl", "seg"):
            conv(f"task2.conv_{s}.0", d, d, 3, bias=False)
            bn(f"task2.conv_{s}.1", d)
            sd[f"task2.pos_embedding_decoder_{s}"] = np.zeros((1, d, 14, 14),
                                                              np.float32)
        for att in ("attention1", "attention2"):
            lin(f"task2.layers.0.{att}.to_qkv", d, 3 * 512, bias=False)
            lin(f"task2.layers.0.{att}.to_out.0", 512, d)
        for ca in ("cross_attention_cl", "cross_attention_seg"):
            for nm in ("to_q", "to_k", "to_v"):
                lin(f"task2.layers.0.{ca}.{nm}", d, 512, bias=False)
            lin(f"task2.layers.0.{ca}.to_out.0", 512, d)
        for nm in ("x_att_norm", "m_att_norm", "x_mlp_norm", "m_mlp_norm"):
            sd[f"task2.layers.0.{nm}.weight"] = np.ones(d, np.float32)
            sd[f"task2.layers.0.{nm}.bias"] = np.zeros(d, np.float32)
        for s in ("x_feed", "m_feed"):
            lin(f"task2.layers.0.{s}.net.0", d, 2048)
            lin(f"task2.layers.0.{s}.net.3", 2048, d)
        # UNetTask's never-stepped AutomaticWeightedLoss sigmas (basicUnet.py:271)
        sd["loss_function.params"] = np.ones(2, np.float32)
    for idx, (ci, co) in zip((4, 3, 2, 1),
                             [(8 * c, 4 * c), (4 * c, 2 * c), (2 * c, c), (c, c)]):
        sd[f"up{idx}.up.weight"] = rng.standard_normal((ci, ci, 2, 2)).astype(np.float32)
        sd[f"up{idx}.up.bias"] = rng.standard_normal(ci).astype(np.float32)
        if alig:
            cbn(f"up{idx}.cca.conv1_e.0", ci, ci)
            cbn(f"up{idx}.cca.conv2_e.0", ci, ci)
            conv(f"up{idx}.cca.fc_avg", ci, ci // 2, 1)
            conv(f"up{idx}.cca.fc_max", ci, ci // 2, 1)
            conv(f"up{idx}.cca.fc_avg_max_sfot", ci // 2, ci, 1)
            conv(f"up{idx}.cca.deformabel.offset_conv", ci, 18, 3)
            conv(f"up{idx}.cca.deformabel.regular_conv", ci, ci, 3)
            sd[f"up{idx}.cca.deformabel.bias"] = np.zeros(ci, np.float32)
        cbn(f"up{idx}.nConvs.0", 2 * ci, co)
        cbn(f"up{idx}.nConvs.1", co, co)
    conv("outc", c, 1, 1)
    lin("fc1", 8 * c, 4 * c)
    lin("fc2", 4 * c, 1)
    return sd


def tree_structure_equal(a, b, path=""):
    """Compare dict trees by keys and leaf shapes."""
    if isinstance(a, dict) != isinstance(b, dict):
        return [f"{path}: type mismatch"]
    if not isinstance(a, dict):
        if tuple(np.shape(a)) != tuple(np.shape(b)):
            return [f"{path}: shape {np.shape(a)} vs {np.shape(b)}"]
        return []
    errs = []
    for k in set(a) | set(b):
        if k not in a:
            errs.append(f"{path}/{k}: missing in converted")
        elif k not in b:
            errs.append(f"{path}/{k}: extra in converted")
        else:
            errs.extend(tree_structure_equal(a[k], b[k], f"{path}/{k}"))
    return errs


class TestUNetConverter:
    def test_structure_matches_init(self):
        sd = synth_unet_state_dict()
        params, stats, unused = convert_unet_task_alig_weight(sd)

        model = UNetTaskAligWeight(n_classes=1)
        ref = model.init({"params": KEY}, jnp.zeros((1, 224, 224, 3)), train=False)
        errs = tree_structure_equal(ref["params"], params, "params")
        errs += tree_structure_equal(ref["batch_stats"], stats, "batch_stats")
        assert not errs, "\n".join(errs[:20])

    def test_dead_params_dropped(self):
        sd = synth_unet_state_dict()
        _, _, unused = convert_unet_task_alig_weight(sd)
        # only the intentionally-dead groups remain unconverted
        for k in unused:
            assert ("deformabel" in k or "cross_attention_seg" in k), k

    def test_apply_runs_with_converted_weights(self):
        sd = synth_unet_state_dict()
        params, stats, _ = convert_unet_task_alig_weight(sd)
        variables = as_variables(params, stats)
        model = UNetTaskAligWeight(n_classes=1)
        # converted pos-embeddings are 14x14, so only 224-sized inputs apply
        # (matching the reference, whose UNet is 224-only for the same reason)
        out = model.apply(variables, jnp.zeros((1, 224, 224, 3)), train=False)
        assert out.shape == (1, 224, 224, 1)
        assert bool(jnp.isfinite(out).all())


class TestUNetVariantConverters:
    """Every implemented (non-flagship) UNet variant is checkpoint-convertible
    (basicUnet.py:133-368); their fc1/fc2 heads are live and must convert."""

    CASES = [
        ("UNetBasic", dict(task2=False, alig=False)),
        ("UNetTask", dict(task2=True, alig=False)),
        ("UNetTaskAlig", dict(task2=True, alig=True)),
    ]

    @pytest.mark.parametrize("name,flags", CASES)
    def test_structure_matches_init(self, name, flags):
        from unet_goolenet_tpu import models
        from unet_goolenet_tpu.models.convert import (
            convert_unet_basic, convert_unet_task, convert_unet_task_alig)

        convert = {"UNetBasic": convert_unet_basic, "UNetTask": convert_unet_task,
                   "UNetTaskAlig": convert_unet_task_alig}[name]
        sd = synth_unet_variant_state_dict(**flags)
        params, stats, unused = convert(sd)
        for k in unused:
            assert ("deformabel" in k or "cross_attention_seg" in k), k

        model = getattr(models, name)(n_classes=1)
        ref = model.init({"params": KEY}, jnp.zeros((1, 224, 224, 3)), train=False)
        errs = tree_structure_equal(ref["params"], params, "params")
        errs += tree_structure_equal(ref["batch_stats"], stats, "batch_stats")
        assert not errs, "\n".join(errs[:20])


def synth_googlenet_state_dict() -> dict:
    """torchvision googlenet naming under the reference's 'googlenet.' prefix."""
    rng = np.random.default_rng(1)
    sd = {}

    def basic(name, ci, co, k):
        sd[f"{name}.conv.weight"] = rng.standard_normal((co, ci, k, k)).astype(np.float32)
        for suffix, val in (("weight", np.ones(co)), ("bias", np.zeros(co)),
                            ("running_mean", np.zeros(co)),
                            ("running_var", np.ones(co))):
            sd[f"{name}.bn.{suffix}"] = val.astype(np.float32)
        sd[f"{name}.bn.num_batches_tracked"] = np.asarray(0)

    p = "googlenet."
    basic(p + "conv1", 3, 64, 7)
    basic(p + "conv2", 64, 64, 1)
    basic(p + "conv3", 64, 192, 3)
    cfg = {
        "inception3a": (192, 64, 96, 128, 16, 32, 32),
        "inception3b": (256, 128, 128, 192, 32, 96, 64),
        "inception4a": (480, 192, 96, 208, 16, 48, 64),
        "inception4b": (512, 160, 112, 224, 24, 64, 64),
        "inception4c": (512, 128, 128, 256, 24, 64, 64),
        "inception4d": (512, 112, 144, 288, 32, 64, 64),
        "inception4e": (528, 256, 160, 320, 32, 128, 128),
        "inception5a": (832, 256, 160, 320, 32, 128, 128),
        "inception5b": (832, 384, 192, 384, 48, 128, 128),
    }
    for nm, (ci, b1, b2r, b2, b3r, b3, b4) in cfg.items():
        basic(f"{p}{nm}.branch1", ci, b1, 1)
        basic(f"{p}{nm}.branch2.0", ci, b2r, 1)
        basic(f"{p}{nm}.branch2.1", b2r, b2, 3)
        basic(f"{p}{nm}.branch3.0", ci, b3r, 1)
        basic(f"{p}{nm}.branch3.1", b3r, b3, 3)
        basic(f"{p}{nm}.branch4.1", ci, b4, 1)
    sd[p + "fc.weight"] = rng.standard_normal((6, 1024)).astype(np.float32)
    sd[p + "fc.bias"] = np.zeros(6, np.float32)
    return sd


class TestGoogLeNetConverter:
    def test_structure_matches_init(self):
        sd = synth_googlenet_state_dict()
        params, stats, unused = convert_googlenet_classifier(sd)
        assert not unused, sorted(unused)[:10]
        model = GoogLeNetClassifier(num_classes=6)
        ref = model.init({"params": KEY, "dropout": KEY},
                         jnp.zeros((1, 224, 224, 3)), train=False)
        errs = tree_structure_equal(ref["params"], params, "params")
        errs += tree_structure_equal(ref["batch_stats"], stats, "batch_stats")
        assert not errs, "\n".join(errs[:20])

    def test_apply_runs(self):
        sd = synth_googlenet_state_dict()
        params, stats, _ = convert_googlenet_classifier(sd)
        model = GoogLeNetClassifier(num_classes=6)
        out = model.apply(as_variables(params, stats),
                          jnp.zeros((2, 64, 64, 3)), train=False)
        assert out.shape == (2, 6)
