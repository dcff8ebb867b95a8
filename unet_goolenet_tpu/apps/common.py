"""Shared CLI plumbing: checkpoints -> TwoStagePipeline.

Every serving-side entry point (infer_e2e, export_serving, serve) restores the
two trained stages the same way the reference's 分类/test.py:139-152 loads its
two torch models; this is that loader, once."""

from __future__ import annotations

import jax.numpy as jnp

from unet_goolenet_tpu.models import GoogLeNetClassifier, UNetTaskAligWeight
from unet_goolenet_tpu.pipeline import TwoStagePipeline
from unet_goolenet_tpu.train import optim
from unet_goolenet_tpu.train.checkpoint import CheckpointManager
from unet_goolenet_tpu.train.cls import init_cls_state
from unet_goolenet_tpu.train.seg import init_seg_state


def load_two_stage(unet_checkpoint: str, gnet_checkpoint: str, key, *,
                   img_size: int = 224, num_classes: int = 6,
                   dtype=jnp.float32, **pipe_kwargs) -> TwoStagePipeline:
    """Restore both stages' checkpoints and build the fused pipeline.

    pipe_kwargs forward to TwoStagePipeline (e.g. fused_up1=False for the
    portable export graph; fused_up1=None to auto-pick per backend)."""
    unet = UNetTaskAligWeight(n_classes=1, dtype=dtype)
    gnet = GoogLeNetClassifier(num_classes=num_classes, dtype=dtype)
    shape = (1, img_size, img_size, 3)
    seg_state = init_seg_state(unet, optim.make_adamw(), key, input_shape=shape)
    seg_state, _ = CheckpointManager(".").restore(unet_checkpoint, seg_state)
    cls_state = init_cls_state(gnet, optim.make_adamw(), key, input_shape=shape)
    cls_state, _ = CheckpointManager(".").restore(gnet_checkpoint, cls_state)
    return TwoStagePipeline(
        unet, {"params": seg_state.params, "batch_stats": seg_state.batch_stats},
        gnet, {"params": cls_state.params, "batch_stats": cls_state.batch_stats},
        img_size=img_size, dtype=dtype, **pipe_kwargs)
