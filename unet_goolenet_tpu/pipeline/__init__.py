"""Fused on-device inference pipelines."""

from unet_goolenet_tpu.pipeline.two_stage import (
    TwoStagePipeline,
    preprocess_gray,
    preprocess_gray_padded,
    segment,
    extract_roi,
)

__all__ = ["TwoStagePipeline", "preprocess_gray", "preprocess_gray_padded",
           "segment", "extract_roi"]
