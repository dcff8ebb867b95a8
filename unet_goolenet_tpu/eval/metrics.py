"""Validation metrics.

Replaces the reference's external metric dependencies with exact-semantics
reimplementations (they are part of the capability surface, SURVEY.md §2.1):
  * seg (分割/main.py:110-144): monai `DiceMetric(include_background=False)`,
    `HausdorffDistanceMetric(euclidean)`, `MeanIoU` — per-sample scores, NaN where
    undefined, nan-mean aggregation.
  * cls (分类/ROI_main.py:169-193): torchmetrics 6-class macro `F1Score`, `Accuracy`,
    `AUROC`, plus the confusion matrix.

Dice/IoU run on device (jnp); Hausdorff runs on host via a distance transform — it
is a val-only metric outside the throughput path (SURVEY.md §7 'hard parts').
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

# ----------------------------------------------------------------- segmentation


def dice_score(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-sample binary Dice. pred/target: (N, H, W[, 1]) in {0,1}.
    NaN where pred and target are both empty (monai semantics)."""
    p = pred.reshape(pred.shape[0], -1).astype(jnp.float32)
    t = target.reshape(target.shape[0], -1).astype(jnp.float32)
    inter = jnp.sum(p * t, axis=1)
    denom = jnp.sum(p, axis=1) + jnp.sum(t, axis=1)
    return jnp.where(denom > 0, 2.0 * inter / denom, jnp.nan)


def iou_score(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-sample binary IoU, NaN where union is empty (monai MeanIoU)."""
    p = pred.reshape(pred.shape[0], -1).astype(jnp.float32)
    t = target.reshape(target.shape[0], -1).astype(jnp.float32)
    inter = jnp.sum(p * t, axis=1)
    union = jnp.sum(p, axis=1) + jnp.sum(t, axis=1) - inter
    return jnp.where(union > 0, inter / union, jnp.nan)


def _boundary(mask: np.ndarray) -> np.ndarray:
    """Edge pixels of a binary mask (erosion difference), like monai's surface
    extraction."""
    m = mask.astype(bool)
    if not m.any():
        return np.zeros_like(m)
    from scipy.ndimage import binary_erosion

    # border_value=0 (scipy default) matches monai get_mask_edges: pixels on the
    # image border stay part of the surface
    return m & ~binary_erosion(m, border_value=0)


def hausdorff_distance(
    pred: np.ndarray, target: np.ndarray, percentile: Optional[float] = None
) -> float:
    """Symmetric euclidean Hausdorff distance between mask surfaces (host-side;
    matches monai HausdorffDistanceMetric(distance_metric='euclidean')).
    Returns NaN if either mask is empty."""
    from scipy.ndimage import distance_transform_edt

    pb = _boundary(np.asarray(pred).squeeze())
    tb = _boundary(np.asarray(target).squeeze())
    if not pb.any() or not tb.any():
        return float("nan")

    def directed(a_edges, b_edges):
        # distance from each edge pixel of a to nearest edge pixel of b
        dt = distance_transform_edt(~b_edges)
        d = dt[a_edges]
        if percentile is not None:
            return float(np.percentile(d, percentile))
        return float(d.max())

    return max(directed(pb, tb), directed(tb, pb))


# --------------------------------------------------------------- classification


def confusion_matrix(preds: np.ndarray, labels: np.ndarray, num_classes: int) -> np.ndarray:
    """(num_classes, num_classes) counts, rows = true class, cols = predicted."""
    cm = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(cm, (np.asarray(labels, np.int64), np.asarray(preds, np.int64)), 1)
    return cm


def _present_classes(cm: np.ndarray) -> np.ndarray:
    """torchmetrics macro averaging (task='multiclass') excludes classes absent
    from BOTH targets and predictions (_adjust_weights_safe_divide)."""
    return (cm.sum(1) > 0) | (cm.sum(0) > 0)


def macro_f1(cm: np.ndarray) -> float:
    """Macro F1 (torchmetrics F1Score(average='macro', task='multiclass')):
    per-class F1 with 0 where undefined, mean over classes present in targets
    or predictions."""
    tp = np.diag(cm).astype(np.float64)
    fp = cm.sum(0) - tp
    fn = cm.sum(1) - tp
    denom = 2 * tp + fp + fn
    f1 = np.where(denom > 0, 2 * tp / np.maximum(denom, 1e-12), 0.0)
    present = _present_classes(cm)
    return float(f1[present].mean()) if present.any() else float("nan")


def macro_accuracy(cm: np.ndarray) -> float:
    """torchmetrics Accuracy(average='macro', task='multiclass'): mean of per-class
    recall over classes present in targets or predictions."""
    tp = np.diag(cm).astype(np.float64)
    support = cm.sum(1)
    recall = np.where(support > 0, tp / np.maximum(support, 1e-12), 0.0)
    present = _present_classes(cm)
    return float(recall[present].mean()) if present.any() else float("nan")


def macro_auroc(scores: np.ndarray, labels: np.ndarray, num_classes: int) -> float:
    """One-vs-rest macro AUROC (rank statistic, matching torchmetrics
    AUROC(average='macro', task='multiclass'), which softmaxes logits internally —
    softmax is not per-class rank-preserving, so we apply it here too). Classes
    absent from labels (or covering all labels) are skipped."""
    scores = np.asarray(scores, np.float64)
    scores = scores - scores.max(axis=1, keepdims=True)
    e = np.exp(scores)
    scores = e / e.sum(axis=1, keepdims=True)
    labels = np.asarray(labels, np.int64)
    aucs = []
    for c in range(num_classes):
        pos = labels == c
        n_pos = int(pos.sum())
        n_neg = len(labels) - n_pos
        if n_pos == 0 or n_neg == 0:
            continue
        s = scores[:, c]
        # Mann-Whitney U via average ranks (ties handled)
        order = np.argsort(s, kind="mergesort")
        ranks = np.empty(len(s), np.float64)
        sorted_s = s[order]
        ranks_sorted = np.arange(1, len(s) + 1, dtype=np.float64)
        # average ranks over ties
        i = 0
        while i < len(s):
            j = i
            while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
                j += 1
            ranks_sorted[i : j + 1] = 0.5 * (i + 1 + j + 1)
            i = j + 1
        ranks[order] = ranks_sorted
        r_pos = ranks[pos].sum()
        auc = (r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
        aucs.append(auc)
    return float(np.mean(aucs)) if aucs else float("nan")


# ------------------------------------------------------------------ accumulators


@dataclass
class SegMetrics:
    """Streaming accumulator mirroring the reference val loop (main.py:110-144):
    update with thresholded masks per batch, aggregate nan-mean at the end.
    The reference's empty-prediction hack (setting pixel [0,0,0]=1 on all-zero masks,
    main.py:134-136) is an opt-in flag."""

    empty_pred_hack: bool = False
    compute_hausdorff: bool = True
    _dice: List[np.ndarray] = field(default_factory=list)
    _iou: List[np.ndarray] = field(default_factory=list)
    _hd: List[float] = field(default_factory=list)

    def update(self, pred_masks: jax.Array, targets: jax.Array) -> None:
        # host-side numpy throughout: these are trivial per-sample sums, and
        # bouncing (N,224,224) arrays back to the device costs more than the math
        p = np.array(pred_masks, np.float64)  # copy: device arrays are read-only
        t = np.asarray(targets, np.float64)
        if self.empty_pred_hack:
            for i in range(p.shape[0]):
                if not p[i].any():
                    flat_idx = np.unravel_index(0, p[i].shape)
                    p[i][flat_idx] = 1
        pf = p.reshape(p.shape[0], -1)
        tf = t.reshape(t.shape[0], -1)
        inter = (pf * tf).sum(1)
        psum, tsum = pf.sum(1), tf.sum(1)
        denom = psum + tsum
        union = denom - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            self._dice.append(np.where(denom > 0, 2 * inter / denom, np.nan))
            self._iou.append(np.where(union > 0, inter / union, np.nan))
        if self.compute_hausdorff:
            for i in range(p.shape[0]):
                self._hd.append(hausdorff_distance(p[i], t[i]))

    def aggregate(self) -> dict:
        out = {
            "dice": float(np.nanmean(np.concatenate(self._dice))) if self._dice else float("nan"),
            "iou": float(np.nanmean(np.concatenate(self._iou))) if self._iou else float("nan"),
        }
        if self.compute_hausdorff:
            out["hausdorff"] = float(np.nanmean(self._hd)) if self._hd else float("nan")
        return out


@dataclass
class ClsMetrics:
    """Streaming 6-class metrics mirroring 分类/ROI_main.py:169-193."""

    num_classes: int = 6
    _scores: List[np.ndarray] = field(default_factory=list)
    _labels: List[np.ndarray] = field(default_factory=list)

    def update(self, logits: jax.Array, labels: jax.Array) -> None:
        self._scores.append(np.asarray(logits))
        self._labels.append(np.asarray(labels))

    def aggregate(self) -> dict:
        scores = np.concatenate(self._scores)
        labels = np.concatenate(self._labels)
        preds = scores.argmax(-1)
        cm = confusion_matrix(preds, labels, self.num_classes)
        return {
            "f1": macro_f1(cm),
            "accuracy": macro_accuracy(cm),
            "auroc": macro_auroc(scores, labels, self.num_classes),
            "confusion": cm,
        }
