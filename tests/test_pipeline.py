"""Fused two-stage pipeline tests (behavioural fixtures from SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from unet_goolenet_tpu.models import UNetTaskAligWeight, GoogLeNetClassifier
from unet_goolenet_tpu.pipeline import (
    TwoStagePipeline,
    preprocess_gray,
    extract_roi,
)

KEY = jax.random.PRNGKey(0)
S = 64  # small pipeline size for CPU tests


def build_pipeline(img_size=S):
    unet = UNetTaskAligWeight(n_classes=1)
    gnet = GoogLeNetClassifier(num_classes=6)
    uv = unet.init({"params": KEY}, jnp.zeros((1, img_size, img_size, 3)), train=False)
    gv = gnet.init({"params": KEY, "dropout": KEY},
                   jnp.zeros((1, img_size, img_size, 3)), train=False)
    return TwoStagePipeline(unet, uv, gnet, gv, img_size=img_size)


class TestPreprocess:
    def test_shapes_and_range(self):
        gray = jax.random.uniform(KEY, (2, 100, 120)) * 255
        out = preprocess_gray(gray, out_hw=(S, S))
        assert out.shape == (2, S, S, 3)
        o = np.asarray(out)
        assert o.min() >= -1e-3 and o.max() <= 1.0 + 1e-3

    def test_wavelet_then_resize_order(self):
        # wavelet at native res then resize != resize then wavelet; lock the former
        gray = (jax.random.uniform(KEY, (1, 96, 96)) * 255)
        a = preprocess_gray(gray, out_hw=(48, 48))
        from unet_goolenet_tpu import ops
        small = ops.resize_bilinear(gray[0], (48, 48), antialias=True)
        b = ops.wavelet_enhance(small)
        assert float(jnp.abs(a[0] - b).max()) > 1e-3


class TestExtractROI:
    def test_channel_swap(self):
        imgs = jax.random.uniform(KEY, (1, S, S, 3))
        masks = jnp.zeros((1, S, S)).at[0, 20:40, 20:40].set(1.0)
        crops_sw, _ = extract_roi(imgs, masks, out_hw=(S, S), swap_rb=True)
        crops_no, _ = extract_roi(imgs, masks, out_hw=(S, S), swap_rb=False)
        np.testing.assert_allclose(np.asarray(crops_sw[..., 0]),
                                   np.asarray(crops_no[..., 2]))
        np.testing.assert_allclose(np.asarray(crops_sw[..., 1]),
                                   np.asarray(crops_no[..., 1]))


class TestEndToEnd:
    def test_full_graph_outputs(self):
        pipe = build_pipeline()
        gray = jax.random.uniform(KEY, (2, 80, 90)) * 255
        out = pipe.infer_from_gray(gray)
        assert out["grades"].shape == (2,)
        assert out["masks"].shape == (2, S, S)
        assert out["boxes"].shape == (2, 4)
        assert out["cls_logits"].shape == (2, 6)
        assert np.isfinite(np.asarray(out["cls_logits"])).all()
        g = np.asarray(out["grades"])
        assert ((g >= 0) & (g < 6)).all()

    def test_empty_mask_fallback_box(self):
        pipe = build_pipeline()
        # constant image -> wavelet channels zero/flat -> untrained UNet likely
        # empty mask; force emptiness by checking the box against mask content
        gray = jnp.full((1, 70, 70), 128.0)
        out = pipe.infer_from_gray(gray)
        if not np.asarray(out["masks"]).any():
            size = S // 2
            c = S // 2
            np.testing.assert_array_equal(
                np.asarray(out["boxes"][0]),
                [c - size // 2, c + size // 2, c - size // 2, c + size // 2])

    def test_single_jit_no_host_transfer(self):
        # the whole e2e path must be one compiled computation
        pipe = build_pipeline()
        lowered = jax.jit(pipe._e2e.__wrapped__).lower(
            pipe.unet_vars, pipe.gnet_vars, jnp.zeros((1, 70, 70)))
        text = lowered.as_text()
        assert "custom_call" not in text.lower() or "host" not in text.lower()

    def test_stage1_only(self):
        pipe = build_pipeline()
        masks = pipe.infer_masks(jax.random.uniform(KEY, (2, S, S, 3)))
        assert masks.shape == (2, S, S)
