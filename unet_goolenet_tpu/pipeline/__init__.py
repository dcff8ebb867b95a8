"""Fused on-device inference pipelines, deployment export, and serving.

Deployment symbols (export_serving/load_serving, GradingServer/MicroBatcher)
are intentionally NOT imported here: pipeline.export and pipeline.serving are
lazy so a serving host that only needs `load_serving` never imports flax
model code. Import them from their modules:

    from unet_goolenet_tpu.pipeline.export import export_serving, load_serving
    from unet_goolenet_tpu.pipeline.serving import GradingServer
"""

from unet_goolenet_tpu.pipeline.two_stage import (
    TwoStagePipeline,
    preprocess_gray,
    preprocess_gray_padded,
    segment,
    extract_roi,
)

__all__ = ["TwoStagePipeline", "preprocess_gray", "preprocess_gray_padded",
           "segment", "extract_roi"]
