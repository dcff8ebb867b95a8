"""Framework configuration (replaces the reference's 分割/config.py).

The reference parses argparse at module import (config.py:71 — a side effect every
importer pays) and carries dozens of dead Synapse/ViT flags. Here: plain frozen
dataclasses, no import-time side effects, only live knobs. CLI entry points build
these from their own argparse in main().
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    n_channels: int = 3
    n_classes: int = 1          # segmentation head channels
    num_grades: int = 6         # classifier classes
    base_channels: int = 64
    bottleneck_depth: int = 1
    bottleneck_heads: int = 8
    bottleneck_dim_head: int = 64
    bottleneck_mlp_dim: int = 2048
    googlenet_fidelity: str = "torchvision"  # or 'paper' (true 5x5 branch)
    aux_logits: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 250
    batch_size: int = 4          # 4 seg / 16 cls in the reference (config.py:54)
    img_size: int = 224
    seed: int = 1234
    lr: float = 1e-4
    weight_decay: float = 0.01
    n_refine: int = 2            # iterative-refinement passes per batch
    dice_weight: float = 0.5
    # ReduceLROnPlateau (main.py:242-243)
    plateau_factor: float = 0.1
    plateau_patience: int = 10
    plateau_threshold: float = 1e-3
    min_lr: float = 1e-5
    # early stopping (main.py:252, 284-290; ROI_main.py:307)
    early_stop_patience: int = 50
    early_stop_extension: int = 20


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    img_size: int = 224
    roi_padding: int = 30
    threshold: float = 0.5
    swap_rb: bool = True         # the reference's BGR2RGB after crop (roi.py:44)
    bf16: bool = False
    batch_size: int = 16


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: Optional[int] = None   # None -> all devices
    model: int = 1
