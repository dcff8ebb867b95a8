"""Metric tests: hand-computable cases plus sklearn as the AUROC oracle."""

import numpy as np
import jax.numpy as jnp

from unet_goolenet_tpu.eval import (
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

RNG = np.random.default_rng(3)


class TestSegMetrics:
    def test_dice_iou_known_case(self):
        p = np.zeros((1, 8, 8), np.float32)
        t = np.zeros((1, 8, 8), np.float32)
        p[0, :4, :4] = 1  # 16 px
        t[0, 2:6, :4] = 1  # 16 px, overlap 8
        d = float(dice_score(jnp.asarray(p), jnp.asarray(t))[0])
        i = float(iou_score(jnp.asarray(p), jnp.asarray(t))[0])
        assert abs(d - 2 * 8 / 32) < 1e-6
        assert abs(i - 8 / 24) < 1e-6

    def test_dice_nan_when_both_empty(self):
        z = jnp.zeros((1, 4, 4))
        assert np.isnan(float(dice_score(z, z)[0]))
        assert np.isnan(float(iou_score(z, z)[0]))

    def test_hausdorff_known_case(self):
        a = np.zeros((16, 16), np.uint8)
        b = np.zeros((16, 16), np.uint8)
        a[4:8, 4:8] = 1
        b[4:8, 7:11] = 1  # shifted 3 right
        hd = hausdorff_distance(a, b)
        assert abs(hd - 3.0) < 1e-6

    def test_hausdorff_identical_zero(self):
        a = np.zeros((16, 16), np.uint8)
        a[2:10, 3:12] = 1
        assert hausdorff_distance(a, a) == 0.0

    def test_hausdorff_empty_nan(self):
        a = np.zeros((8, 8), np.uint8)
        b = np.ones((8, 8), np.uint8)
        assert np.isnan(hausdorff_distance(a, b))

    def test_accumulator_with_empty_pred_hack(self):
        m = SegMetrics(empty_pred_hack=True, compute_hausdorff=False)
        pred = np.zeros((2, 8, 8), np.float32)  # all-empty predictions
        targ = np.zeros((2, 8, 8), np.float32)
        targ[:, 0, 0] = 1
        m.update(jnp.asarray(pred), jnp.asarray(targ))
        out = m.aggregate()
        # hack sets pixel (0,0)=1 which exactly matches target -> dice 1
        assert out["dice"] == 1.0


class TestClsMetrics:
    def test_confusion_matrix(self):
        preds = np.array([0, 1, 2, 2, 1])
        labels = np.array([0, 1, 1, 2, 1])
        cm = confusion_matrix(preds, labels, 3)
        assert cm[1, 1] == 2 and cm[1, 2] == 1 and cm[2, 2] == 1 and cm.sum() == 5

    def test_macro_accuracy_is_mean_recall(self):
        cm = np.array([[3, 1], [2, 2]])
        # recalls: 3/4, 2/4 -> macro 0.625
        assert abs(macro_accuracy(cm) - 0.625) < 1e-9

    def test_macro_f1_known(self):
        cm = np.array([[2, 0], [0, 2]])
        assert macro_f1(cm) == 1.0

    def test_macro_excludes_fully_absent_classes(self):
        # torchmetrics multiclass macro ignores classes absent from BOTH targets
        # and predictions (_adjust_weights_safe_divide)
        cm = np.zeros((3, 3), np.int64)
        cm[0, 0] = 4  # class 0 perfect
        cm[1, 1] = 2  # class 1 perfect; class 2 never appears anywhere
        assert macro_f1(cm) == 1.0
        assert macro_accuracy(cm) == 1.0
        # class 2 predicted (but never true) DOES count
        cm[0, 2] = 1
        assert macro_f1(cm) < 1.0

    def test_auroc_vs_sklearn(self):
        from sklearn.metrics import roc_auc_score

        n, c = 200, 6
        scores = RNG.standard_normal((n, c))
        labels = RNG.integers(0, c, n)
        # make it slightly informative
        scores[np.arange(n), labels] += 1.0
        ref = roc_auc_score(labels, np.exp(scores) / np.exp(scores).sum(1, keepdims=True),
                            multi_class="ovr", average="macro")
        got = macro_auroc(scores, labels, c)
        assert abs(ref - got) < 1e-9

    def test_accumulator_end_to_end(self):
        m = ClsMetrics(num_classes=6)
        for _ in range(3):
            logits = RNG.standard_normal((16, 6))
            labels = RNG.integers(0, 6, 16)
            m.update(jnp.asarray(logits), jnp.asarray(labels))
        out = m.aggregate()
        assert set(out) == {"f1", "accuracy", "auroc", "confusion"}
        assert out["confusion"].sum() == 48
