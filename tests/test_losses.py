"""Loss-zoo tests: torch-functional oracles where the semantics are standard,
property tests (perfect-prediction, known tiny cases) for the exotic ones."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from unet_goolenet_tpu.train import losses as L

RNG = np.random.default_rng(1)


def rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def rand_mask(*shape):
    return (RNG.random(shape) > 0.5).astype(np.float32)


class TestCoreLosses:
    def test_bce_with_logits_vs_torch(self):
        x, t = rand(4, 8, 8, 1), rand_mask(4, 8, 8, 1)
        ref = tF.binary_cross_entropy_with_logits(
            torch.from_numpy(x), torch.from_numpy(t)).item()
        got = float(L.binary_cross_entropy_loss(jnp.asarray(x), jnp.asarray(t)))
        assert abs(ref - got) < 1e-5

    def test_soft_dice_monai_formula(self):
        # monai DiceLoss(sigmoid=True): per-(sample,channel), smooth 1e-5/1e-5
        x, t = rand(3, 6, 6, 1), rand_mask(3, 6, 6, 1)
        p = 1 / (1 + np.exp(-x))
        inter = (p * t).sum(axis=(1, 2))
        denom = p.sum(axis=(1, 2)) + t.sum(axis=(1, 2))
        ref = float(np.mean(1 - (2 * inter + 1e-5) / (denom + 1e-5)))
        got = float(L.soft_dice_loss(jnp.asarray(x), jnp.asarray(t)))
        assert abs(ref - got) < 1e-5

    def test_dc_and_bce_weighting(self):
        x, t = rand(2, 6, 6, 1), rand_mask(2, 6, 6, 1)
        full = float(L.dc_and_bce_loss(jnp.asarray(x), jnp.asarray(t), dice_weight=0.5))
        bce = float(L.binary_cross_entropy_loss(jnp.asarray(x), jnp.asarray(t)))
        dice = float(L.soft_dice_loss(jnp.asarray(x), jnp.asarray(t)))
        assert abs(full - (0.5 * bce + 0.5 * dice)) < 1e-6

    def test_cross_entropy_vs_torch(self):
        x = rand(8, 6)
        y = RNG.integers(0, 6, 8)
        ref = tF.cross_entropy(torch.from_numpy(x), torch.from_numpy(y)).item()
        got = float(L.cross_entropy(jnp.asarray(x), jnp.asarray(y)))
        assert abs(ref - got) < 1e-5

    def test_bce_focal_matches_reference_formula(self):
        x, t = rand(4, 5), rand_mask(4, 5)
        pt = 1 / (1 + np.exp(-x))
        g, a = 2.0, 0.4
        ref = float(np.mean(
            -a * (1 - pt) ** g * t * np.log(pt)
            - (1 - a) * pt ** g * (1 - t) * np.log(1 - pt)))
        got = float(L.bce_focal_loss(jnp.asarray(x), jnp.asarray(t), gamma=g, alpha=a))
        assert abs(ref - got) < 1e-4


class TestFocalFamily:
    def test_multiclass_focal_alpha_vs_torch(self):
        x = rand(10, 2)
        y = RNG.integers(0, 2, 10)
        alpha = np.array([0.6, 0.4], np.float32)
        logsoft = tF.log_softmax(torch.from_numpy(x), dim=1)
        logpt = logsoft.gather(1, torch.from_numpy(y).view(-1, 1)).view(-1)
        pt = torch.exp(logpt)
        ref = (torch.from_numpy(alpha)[torch.from_numpy(y)]
               * (1 - pt) ** 1.5 * (-logpt)).mean().item()
        got = float(L.multiclass_focal_loss_with_alpha(
            jnp.asarray(x), jnp.asarray(y), alpha=alpha, gamma=1.5))
        assert abs(ref - got) < 1e-5

    def test_focal_gamma_zero_is_weighted_ce(self):
        x = rand(10, 3)
        y = RNG.integers(0, 3, 10)
        got = float(L.focal_loss_multiclass(jnp.asarray(x), jnp.asarray(y),
                                            gamma=0.0, num_classes=3))
        ref = tF.cross_entropy(torch.from_numpy(x), torch.from_numpy(y)).item()
        assert abs(got - ref) < 1e-5


class TestBinaryFamily:
    def test_perfect_prediction_low_loss(self):
        t = rand_mask(2, 8, 8, 1)
        x = jnp.asarray((t * 2 - 1) * 20.0)  # saturated logits
        tj = jnp.asarray(t)
        assert float(L.binary_dice_loss(x, tj)) < 1e-3
        assert float(L.binary_jaccard_loss(x, tj)) < 1e-3
        assert float(L.binary_ss_loss(x, tj)) < 1e-3
        assert float(L.binary_cross_entropy_dice_loss(x, tj)) < 1e-3

    def test_binary_tversky_takes_probs(self):
        t = rand_mask(2, 8, 8, 1)
        assert float(L.binary_tversky_loss(jnp.asarray(t), jnp.asarray(t))) < 1e-4

    def test_mcc_perfect_and_inverted(self):
        t = rand_mask(1, 8, 8, 1)
        assert float(L.mcc_loss(jnp.asarray(t), jnp.asarray(t))) < 0.05
        assert float(L.mcc_loss(jnp.asarray(1 - t), jnp.asarray(t))) > 1.5


class TestTversky:
    def test_tversky_equals_negative_dice_when_alpha_beta_half(self):
        x, t = rand_mask(2, 8, 8, 1), rand_mask(2, 8, 8, 1)
        tv = float(L.tversky_loss(jnp.asarray(x), jnp.asarray(t),
                                  alpha=0.5, beta=0.5, smooth=1.0))
        # with alpha=beta=0.5: tversky == dice
        inter = (x * t).sum(axis=(1, 2, 3))
        dice = (inter + 1.0) / (0.5 * (x.sum(axis=(1, 2, 3)) + t.sum(axis=(1, 2, 3))) + 1.0)
        assert abs(tv + dice.mean()) < 1e-5

    def test_focal_tversky_positive(self):
        x, t = rand(2, 8, 8, 1), rand_mask(2, 8, 8, 1)
        v = float(L.focal_tversky_loss(jnp.asarray(x), jnp.asarray(t)))
        assert np.isfinite(v) and v >= 0


class TestLovasz:
    def test_hinge_perfect_prediction(self):
        t = rand_mask(2, 8, 8)
        x = jnp.asarray((t * 2 - 1) * 10.0)
        assert float(L.lovasz_hinge(x, jnp.asarray(t))) < 1e-6
        assert float(L.lovasz_hinge(x, jnp.asarray(t), per_image=True)) < 1e-6

    def test_hinge_tiny_case(self):
        # single pixel, wrong with margin: errors=[1 - (-1*1)] = 2, grad=[1] -> loss 2
        x = jnp.asarray([[[-1.0]]])
        t = jnp.asarray([[[1.0]]])
        assert abs(float(L.lovasz_hinge(x, t)) - 2.0) < 1e-6

    def test_softmax_perfect(self):
        y = RNG.integers(0, 3, (2, 8, 8))
        logits = np.full((2, 8, 8, 3), -10.0, np.float32)
        for c in range(3):
            logits[..., c][y == c] = 10.0
        v = float(L.lovasz_softmax(jnp.asarray(logits), jnp.asarray(y)))
        assert v < 1e-3


class TestMutilFamily:
    def test_mutil_ce_matches_presence_weighted_torch(self):
        x = rand(4, 8, 8, 5)
        y = RNG.integers(0, 3, (4, 8, 8))  # classes 3,4 absent
        onehot = np.eye(5, dtype=np.float32)[y.reshape(-1)]
        present = (onehot.sum(0) > 0).astype(np.float32)
        ref = tF.cross_entropy(
            torch.from_numpy(x.reshape(-1, 5)), torch.from_numpy(y.reshape(-1)),
            weight=torch.from_numpy(present)).item()
        got = float(L.mutil_cross_entropy_loss(jnp.asarray(x), jnp.asarray(y)))
        assert abs(ref - got) < 1e-5

    def test_mutil_dice_sign_quirk(self):
        # the reference returns MINUS dice, so perfect prediction -> about -1
        y = RNG.integers(0, 3, (2, 8, 8))
        logits = np.full((2, 8, 8, 3), -20.0, np.float32)
        for c in range(3):
            logits[..., c][y == c] = 20.0
        v = float(L.mutil_dice_loss(jnp.asarray(logits), jnp.asarray(y)))
        assert v < -0.99

    def test_mutil_el_dice_clipped(self):
        x = rand(1, 8, 8, 3)
        y = RNG.integers(0, 3, (1, 8, 8))
        v = float(L.mutil_el_dice_loss(jnp.asarray(x), jnp.asarray(y)))
        assert 0.0 <= v <= 2.0


class TestAutoWeighted:
    def test_formula(self):
        p = jnp.asarray([1.0, 2.0])
        v = float(L.automatic_weighted_loss(p, jnp.asarray(1.0), jnp.asarray(2.0)))
        ref = 0.5 / 1 * 1 + np.log(2.0) + 0.5 / 4 * 2 + np.log(5.0)
        assert abs(v - ref) < 1e-5

    def test_aux_weighted_ce(self):
        x = rand(4, 6)
        a1, a2 = rand(4, 6), rand(4, 6)
        y = RNG.integers(0, 6, 4)
        main = float(L.cross_entropy(jnp.asarray(x), jnp.asarray(y)))
        l1 = float(L.cross_entropy(jnp.asarray(a1), jnp.asarray(y)))
        l2 = float(L.cross_entropy(jnp.asarray(a2), jnp.asarray(y)))
        got = float(L.aux_weighted_cross_entropy(
            jnp.asarray(x), [jnp.asarray(a1), jnp.asarray(a2)], jnp.asarray(y)))
        assert abs(got - (main + 0.3 * (l1 + l2))) < 1e-5
