"""Device-side augmentation tests: semantics vs host/PIL equivalents."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from unet_goolenet_tpu.data.augment import AugmentConfig
from unet_goolenet_tpu.data import augment_device as ad

KEY = jax.random.PRNGKey(0)
RNG = np.random.default_rng(5)


class TestPrimitives:
    def test_rotate_matches_pil_nearest(self):
        img = (RNG.random((33, 33, 3)) * 255).astype(np.uint8)
        angle = 17.0
        ref = np.asarray(
            Image.fromarray(img).rotate(angle, resample=Image.NEAREST)
        ).astype(np.float32) / 255.0
        got = np.asarray(ad.rotate_nearest(jnp.asarray(img, jnp.float32) / 255.0,
                                           jnp.float32(angle)))
        # nearest resampling: identical except border-rounding pixels
        mismatch = (np.abs(ref - got).max(-1) > 1e-3).mean()
        assert mismatch < 0.08, mismatch

    def test_rotate_zero_is_identity(self):
        img = jnp.asarray(RNG.random((16, 16, 3)), jnp.float32)
        out = ad.rotate_nearest(img, jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_contrast_matches_torch_formula(self):
        img = jnp.asarray(RNG.random((8, 8, 3)), jnp.float32)
        f = 1.4
        got = ad.adjust_contrast(img, f)
        gray_mean = float(jnp.mean(img @ jnp.array([0.299, 0.587, 0.114])))
        ref = np.clip((np.asarray(img) - gray_mean) * f + gray_mean, 0, 1)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    def test_saturation_zero_is_grayscale(self):
        img = jnp.asarray(RNG.random((8, 8, 3)), jnp.float32)
        out = np.asarray(ad.adjust_saturation(img, 0.0))
        np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-5)

    def test_blur_preserves_mean_roughly(self):
        img = jnp.asarray(RNG.random((32, 32, 3)), jnp.float32)
        out = ad.gaussian_blur(img, jnp.float32(0.8))
        assert abs(float(out.mean() - img.mean())) < 5e-3
        assert float(jnp.var(out)) < float(jnp.var(img))

    def test_hue_identity_at_zero(self):
        img = jnp.asarray(RNG.random((8, 8, 3)), jnp.float32)
        out = ad.adjust_hue(img, jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-2)


class TestBatchedAugment:
    def test_eval_config_is_identity(self):
        aug = ad.make_device_augment(AugmentConfig.eval(32))
        imgs = jnp.asarray(RNG.random((4, 32, 32, 3)), jnp.float32)
        out = aug(KEY, imgs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-6)

    def test_train_config_changes_images_deterministically(self):
        aug = ad.make_device_augment(AugmentConfig.cls_train(32))
        imgs = jnp.asarray(RNG.random((4, 32, 32, 3)), jnp.float32)
        a = aug(KEY, imgs)
        b = aug(KEY, imgs)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # same key
        c = aug(jax.random.PRNGKey(1), imgs)
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3  # new key
        assert np.abs(np.asarray(a) - np.asarray(imgs)).max() > 1e-3

    def test_joint_mask_geometry(self):
        cfg = AugmentConfig(img_size=32, ori_size=32, p_hflip=1.0, p_rota=1.0)
        aug = ad.make_device_augment(cfg, with_mask=True)
        imgs = jnp.zeros((2, 32, 32, 3)).at[:, :, :16].set(1.0)
        masks = jnp.zeros((2, 32, 32), jnp.int32).at[:, :, :16].set(1)
        out_i, out_m = aug(KEY, imgs, masks)
        # image and mask undergo identical geometry: thresholded image == mask
        approx = (np.asarray(out_i[..., 0]) > 0.5).astype(np.int32)
        agree = (approx == np.asarray(out_m)).mean()
        assert agree > 0.97, agree

    def test_values_stay_in_range(self):
        aug = ad.make_device_augment(AugmentConfig.cls_train(32))
        imgs = jnp.asarray(RNG.random((8, 32, 32, 3)), jnp.float32)
        for i in range(3):
            out = np.asarray(aug(jax.random.PRNGKey(i), imgs))
            assert out.min() >= -1e-5 and out.max() <= 1.0 + 1e-5
