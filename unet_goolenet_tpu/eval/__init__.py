"""Evaluation metrics (seg: Dice/IoU/Hausdorff; cls: F1/Acc/AUROC/confusion)."""

from unet_goolenet_tpu.eval.metrics import (
    dice_score,
    iou_score,
    hausdorff_distance,
    confusion_matrix,
    macro_f1,
    macro_accuracy,
    macro_auroc,
    SegMetrics,
    ClsMetrics,
)

__all__ = [
    "dice_score",
    "iou_score",
    "hausdorff_distance",
    "confusion_matrix",
    "macro_f1",
    "macro_accuracy",
    "macro_auroc",
    "SegMetrics",
    "ClsMetrics",
]
