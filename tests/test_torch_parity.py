"""Model-level forward parity against an independent torch oracle (SURVEY.md §4:
"end-to-end Dice/top-1 parity" backbone).

One reference-named state dict (randomised values) is fed to three forwards:
  (a) benchmarks/torch_baseline.unet_forward_ref / gnet_forward_ref — functional
      torch written from the reference semantics (分割/nets/basicUnet.py:369-437,
      分割/nets/tasks.py:149-231, 分类/ROI_main.py:86-95);
  (b) models.convert -> flax model.apply;
  (c) pipeline.engine.unet_forward (the BN-folded serving path).
Logits must agree — this breaks the circularity of converter tests that only
compare against the converter's own naming assumptions, and catches silent
transposition / BN-semantics bugs anywhere in the stack.
"""

import os
import sys

import numpy as np
import pytest
import torch
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

from test_convert import synth_unet_state_dict, synth_googlenet_state_dict
from torch_baseline import unet_forward_ref, gnet_forward_ref

from unet_goolenet_tpu.models import UNetTaskAligWeight, GoogLeNetClassifier
from unet_goolenet_tpu.models.convert import (
    convert_unet_task_alig_weight,
    convert_googlenet_classifier,
    as_variables,
)
from unet_goolenet_tpu.pipeline import engine


def randomize_state_dict(sd: dict, seed: int) -> dict:
    """Replace the synthetic dict's values with well-scaled random ones so the
    comparison exercises every transpose/semantic (zero/identity values would
    hide e.g. a missed pos-embedding transpose or swapped BN mean/var)."""
    rng = np.random.default_rng(seed)
    out = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k.endswith("num_batches_tracked"):
            out[k] = v
        elif k.endswith("running_mean"):
            out[k] = rng.normal(0.0, 0.2, v.shape).astype(np.float32)
        elif k.endswith("running_var"):
            out[k] = rng.uniform(0.5, 1.5, v.shape).astype(np.float32)
        elif "pos_embedding" in k:
            out[k] = rng.normal(0.0, 0.1, v.shape).astype(np.float32)
        elif v.ndim >= 2:  # conv / linear / deconv weights: He-ish scaling
            fan = float(np.prod(v.shape[1:]))
            out[k] = rng.normal(0.0, fan ** -0.5, v.shape).astype(np.float32)
        elif k.endswith(".weight"):  # BN / LayerNorm scale
            out[k] = rng.uniform(0.5, 1.5, v.shape).astype(np.float32)
        elif k.endswith(".bias"):
            out[k] = rng.normal(0.0, 0.1, v.shape).astype(np.float32)
        else:
            out[k] = v
    return out


class TestUNetForwardParity:
    @pytest.fixture(scope="class")
    def setup(self):
        sd = randomize_state_dict(synth_unet_state_dict(), seed=7)
        rng = np.random.default_rng(11)
        x = rng.uniform(0.0, 1.0, (2, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            ref = unet_forward_ref(sd, torch.from_numpy(x).permute(0, 3, 1, 2))
        ref = ref.permute(0, 2, 3, 1).numpy()
        params, stats, _ = convert_unet_task_alig_weight(sd)
        variables = as_variables(params, stats)
        return sd, x, ref, variables

    def test_flax_apply_matches_torch(self, setup):
        _, x, ref, variables = setup
        model = UNetTaskAligWeight(n_classes=1)
        out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
        assert out.shape == ref.shape
        diff = np.abs(out - ref).max()
        assert diff <= 1e-4, f"flax vs torch max|diff|={diff}"

    def test_engine_matches_torch(self, setup):
        _, x, ref, variables = setup
        out = np.asarray(engine.unet_forward(variables, jnp.asarray(x)))
        diff = np.abs(out - ref).max()
        assert diff <= 1e-4, f"engine vs torch max|diff|={diff}"


class TestUNetVariantForwardParity:
    """basicUnet.py:133-368 variants: converted weights must reproduce the torch
    forward for BOTH heads (seg logits and the live fc1/fc2 scalar head)."""

    CASES = [
        ("UNetBasic", dict(task2=False, alig=False)),
        ("UNetTask", dict(task2=True, alig=False)),
        ("UNetTaskAlig", dict(task2=True, alig=True)),
    ]

    @pytest.mark.parametrize("name,flags", CASES)
    def test_flax_apply_matches_torch(self, name, flags):
        from test_convert import synth_unet_variant_state_dict
        from torch_baseline import unet_variant_forward_ref

        from unet_goolenet_tpu import models
        from unet_goolenet_tpu.models.convert import (
            convert_unet_basic, convert_unet_task, convert_unet_task_alig)

        convert = {"UNetBasic": convert_unet_basic, "UNetTask": convert_unet_task,
                   "UNetTaskAlig": convert_unet_task_alig}[name]
        sd = randomize_state_dict(synth_unet_variant_state_dict(**flags), seed=23)
        rng = np.random.default_rng(29)
        x = rng.uniform(0.0, 1.0, (1, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            ref_logits, ref_cl = unet_variant_forward_ref(
                sd, torch.from_numpy(x).permute(0, 3, 1, 2), **flags)
        ref_logits = ref_logits.permute(0, 2, 3, 1).numpy()
        ref_cl = ref_cl.numpy()

        params, stats, _ = convert(sd)
        model = getattr(models, name)(n_classes=1)
        logits, cl = model.apply(as_variables(params, stats), jnp.asarray(x),
                                 train=False)
        diff = np.abs(np.asarray(logits) - ref_logits).max()
        assert diff <= 1e-4, f"{name} seg logits max|diff|={diff}"
        cdiff = np.abs(np.asarray(cl) - ref_cl).max()
        assert cdiff <= 1e-4, f"{name} cl head max|diff|={cdiff}"


class TestGoogLeNetForwardParity:
    def test_flax_apply_matches_torch(self):
        sd = randomize_state_dict(synth_googlenet_state_dict(), seed=13)
        rng = np.random.default_rng(17)
        x = rng.uniform(0.0, 1.0, (2, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            ref = gnet_forward_ref(sd, torch.from_numpy(x).permute(0, 3, 1, 2))
        ref = ref.numpy()
        params, stats, unused = convert_googlenet_classifier(sd)
        assert not unused
        model = GoogLeNetClassifier(num_classes=6)
        out = np.asarray(model.apply(as_variables(params, stats),
                                     jnp.asarray(x), train=False))
        diff = np.abs(out - ref).max()
        assert diff <= 1e-4, f"flax vs torch max|diff|={diff}"
