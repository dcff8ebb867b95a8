"""Fused on-device inference pipelines."""

from unet_goolenet_tpu.pipeline.two_stage import (
    TwoStagePipeline,
    preprocess_gray,
    segment,
    extract_roi,
)

__all__ = ["TwoStagePipeline", "preprocess_gray", "segment", "extract_roi"]
