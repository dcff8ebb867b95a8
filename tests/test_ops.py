"""Parity tests for the XLA op layer, with PyTorch (CPU) as the oracle.

The reference stack is torch-based, so op-for-op agreement with torch.nn.functional
is the foundation of end-to-end Dice/top-1 parity (SURVEY.md §4).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from unet_goolenet_tpu import ops

RNG = np.random.default_rng(0)


def t2j_nchw(x):
    """torch NCHW ndarray -> jax NHWC"""
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def j2n_nhwc(x):
    """jax NHWC -> numpy NCHW"""
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


class TestConv2d:
    @pytest.mark.parametrize("k,pad,stride", [(3, 1, 1), (1, 0, 1), (7, 3, 2), (3, 1, 2), (5, 2, 1)])
    def test_vs_torch(self, k, pad, stride):
        x = rand(2, 8, 16, 16)
        w = rand(12, 8, k, k)
        b = rand(12)
        ref = tF.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                        stride=stride, padding=pad).numpy()
        got = ops.conv2d(t2j_nchw(x), jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                         jnp.asarray(b), stride=stride, padding=pad)
        np.testing.assert_allclose(j2n_nhwc(got), ref, rtol=1e-4, atol=1e-4)

    def test_fold_batchnorm(self):
        x = rand(2, 8, 10, 10)
        w = rand(12, 8, 3, 3)
        b = rand(12)
        gamma, beta = rand(12), rand(12)
        mean, var = rand(12), np.abs(rand(12)) + 0.5
        xt = torch.from_numpy(x)
        y = tF.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b), padding=1)
        ref = tF.batch_norm(y, torch.from_numpy(mean), torch.from_numpy(var),
                            torch.from_numpy(gamma), torch.from_numpy(beta),
                            training=False, eps=1e-5)
        ref = tF.relu(ref).numpy()
        got = ops.conv2d_bn_act(
            t2j_nchw(x), jnp.asarray(np.transpose(w, (2, 3, 1, 0))), jnp.asarray(b),
            jnp.asarray(gamma), jnp.asarray(beta), jnp.asarray(mean), jnp.asarray(var),
            padding=1)
        np.testing.assert_allclose(j2n_nhwc(got), ref, rtol=1e-4, atol=1e-4)


class TestConvTranspose:
    def test_2x2_s2_vs_torch(self):
        x = rand(2, 8, 7, 9)
        w = rand(8, 6, 2, 2)  # torch layout (in, out, kh, kw)
        b = rand(6)
        ref = tF.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                                  torch.from_numpy(b), stride=2).numpy()
        # our layout: (kh, kw, in, out)
        wj = jnp.asarray(np.transpose(w, (2, 3, 0, 1)))
        got = ops.conv_transpose2x2(t2j_nchw(x), wj, jnp.asarray(b))
        assert got.shape == (2, 14, 18, 6)
        np.testing.assert_allclose(j2n_nhwc(got), ref, rtol=1e-4, atol=1e-4)


class TestPool:
    def test_maxpool2x2(self):
        x = rand(2, 4, 16, 16)
        ref = tF.max_pool2d(torch.from_numpy(x), 2).numpy()
        got = ops.max_pool2d(t2j_nchw(x), 2)
        np.testing.assert_allclose(j2n_nhwc(got), ref)

    def test_maxpool_3x3_s2_ceil(self):
        # GoogLeNet stem pool: odd size exercises ceil_mode
        x = rand(2, 4, 15, 17)
        ref = tF.max_pool2d(torch.from_numpy(x), 3, stride=2, ceil_mode=True).numpy()
        got = ops.max_pool2d(t2j_nchw(x), 3, stride=2, ceil_mode=True)
        np.testing.assert_allclose(j2n_nhwc(got), ref)

    def test_maxpool2x2_grad_vs_torch(self):
        # the custom VJP (ops/pool.py max_pool2x2) must route ties like torch:
        # grad to the FIRST max in window scan order. Build inputs with
        # deliberate ties: quantised values collide often.
        x = np.round(rand(2, 4, 8, 8) * 2).astype(np.float32) / 2
        g = rand(2, 4, 4, 4)
        xt = torch.from_numpy(x).requires_grad_()
        tF.max_pool2d(xt, 2).backward(torch.from_numpy(g))
        ref = xt.grad.numpy()

        _, vjp = jax.vjp(lambda v: ops.max_pool2d(v, 2), t2j_nchw(x))
        (got,) = vjp(t2j_nchw(g))
        np.testing.assert_array_equal(j2n_nhwc(got), ref)

    def test_maxpool2x2_grad_vs_xla_adjoint(self):
        # on tie-free data the custom VJP must equal the raw reduce_window
        # adjoint bit-for-bit
        from jax import lax
        x = rand(2, 6, 10, 4)  # NHWC directly
        g = rand(2, 3, 5, 4)

        def raw(v):
            return lax.reduce_window(v, -jnp.inf, lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

        _, vjp_fast = jax.vjp(lambda v: ops.max_pool2d(v, 2), jnp.asarray(x))
        _, vjp_raw = jax.vjp(raw, jnp.asarray(x))
        np.testing.assert_array_equal(
            np.asarray(vjp_fast(jnp.asarray(g))[0]),
            np.asarray(vjp_raw(jnp.asarray(g))[0]))

    def test_global_pools(self):
        x = rand(2, 4, 9, 11)
        np.testing.assert_allclose(
            np.asarray(ops.global_avg_pool(t2j_nchw(x))),
            x.mean(axis=(2, 3)).transpose(0, 1), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ops.global_max_pool(t2j_nchw(x))), x.max(axis=(2, 3)))

    @pytest.mark.parametrize("out_hw", [(1, 1), (4, 4), (14, 1), (1, 14), (3, 5)])
    def test_adaptive_avg_pool(self, out_hw):
        x = rand(2, 4, 14, 14)
        ref = tF.adaptive_avg_pool2d(torch.from_numpy(x), out_hw).numpy()
        got = ops.adaptive_avg_pool(t2j_nchw(x), out_hw)
        np.testing.assert_allclose(j2n_nhwc(got), ref, rtol=1e-5, atol=1e-6)


class TestResize:
    def test_bilinear_matches_torch_antialias(self):
        # PIL-bilinear == torchvision antialiased bilinear == jax antialias resize
        x = rand(1, 3, 37, 53)
        ref = tF.interpolate(torch.from_numpy(x), size=(224, 224), mode="bilinear",
                             align_corners=False, antialias=True).numpy()
        got = ops.resize_bilinear(t2j_nchw(x), (224, 224), antialias=True)
        np.testing.assert_allclose(j2n_nhwc(got), ref, rtol=1e-3, atol=1e-3)

    def test_bilinear_downscale_cv2_semantics(self):
        import cv2
        x = rand(64, 48)
        ref = cv2.resize(x, (24, 32), interpolation=cv2.INTER_LINEAR)
        got = ops.resize_bilinear(jnp.asarray(x), (32, 24), antialias=False)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)

    def test_nearest(self):
        x = rand(1, 1, 10, 10)
        ref = tF.interpolate(torch.from_numpy(x), size=(5, 5), mode="nearest-exact").numpy()
        got = ops.resize_nearest(t2j_nchw(x), (5, 5))
        np.testing.assert_allclose(j2n_nhwc(got), ref)


class TestResizeValid:
    """resize_bilinear_valid: the size-bucket path's dynamic-extent resize must
    reproduce jax.image.resize of the unpadded image."""

    @pytest.mark.parametrize("hw", [(37, 53), (40, 48)])
    def test_matches_static_resize_on_padded_buffer(self, hw):
        h, w = hw
        x = rand(h, w)
        ref = np.asarray(ops.resize_bilinear(jnp.asarray(x), (64, 64),
                                             antialias=True))
        xp = np.pad(x, ((0, 96 - h), (0, 96 - w)), mode="edge")
        fn = jax.jit(lambda b, v: ops.resize_bilinear_valid(b, v, (64, 64)))
        got = np.asarray(fn(jnp.asarray(xp), jnp.asarray([h, w])))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_dynamic_out_valid_upscale(self):
        # cA -> native-size upsample inside a padded buffer (cv2 semantics)
        x = rand(19, 27)
        ref = np.asarray(ops.resize_bilinear(jnp.asarray(x), (37, 53),
                                             antialias=False))
        xp = np.pad(x, ((0, 48 - 19), (0, 48 - 27)), mode="edge")
        got = np.asarray(ops.resize_bilinear_valid(
            jnp.asarray(xp), jnp.asarray([19, 27]), (96, 96),
            out_valid_hw=jnp.asarray([37, 53]), antialias=False))
        np.testing.assert_allclose(got[:37, :53], ref, rtol=1e-4, atol=1e-5)


class TestWaveletPadded:
    """wavelet_enhance_padded (size buckets): valid-region parity vs the exact
    path on edge-padded buffers, even and odd native sizes."""

    @pytest.mark.parametrize("hw", [(40, 48), (37, 53)])
    def test_valid_region_matches_exact(self, hw):
        h, w = hw
        gray = (RNG.random((h, w)) * 255).astype(np.float32)
        exact = np.asarray(ops.wavelet_enhance(jnp.asarray(gray),
                                               quantize_uint8=False))
        grayp = np.pad(gray, ((0, 64 - h), (0, 64 - w)), mode="edge")
        fn = jax.jit(lambda g, v: ops.wavelet_enhance_padded(
            g, v, quantize_uint8=False))
        padded = np.asarray(fn(jnp.asarray(grayp), jnp.asarray([h, w])))
        np.testing.assert_allclose(padded[:h, :w], exact, rtol=1e-4, atol=1e-5)


class TestWavelet:
    def test_haar_blocks(self):
        x = rand(8, 8) * 100
        cA, (cH, cV, cD) = ops.haar_dwt2(jnp.asarray(x))
        # manual 2x2 block check at (0,0)
        a, b, c, d = x[0, 0], x[0, 1], x[1, 0], x[1, 1]
        np.testing.assert_allclose(float(cA[0, 0]), (a + b + c + d) / 2, rtol=1e-5)
        np.testing.assert_allclose(abs(float(cD[0, 0])), abs((a - b - c + d) / 2), rtol=1e-5)
        # Parseval-ish: energy preserved by orthonormal transform
        e_in = (x ** 2).sum()
        e_out = sum((np.asarray(v) ** 2).sum() for v in (cA, cH, cV, cD))
        np.testing.assert_allclose(e_in, e_out, rtol=1e-5)

    def test_haar_odd_sizes(self):
        x = rand(7, 9)
        cA, _ = ops.haar_dwt2(jnp.asarray(x))
        assert cA.shape == (4, 5)

    def test_wavelet_enhance_range_and_channels(self):
        x = (RNG.random((64, 64)) * 255).astype(np.float32)
        out = ops.wavelet_enhance(jnp.asarray(x))
        assert out.shape == (64, 64, 3)
        o = np.asarray(out)
        assert o.min() >= 0.0 and o.max() <= 1.0
        # R channel is the min-max normalised gray, quantised through uint8
        r_ref = (x - x.min()) / (x.max() - x.min())
        r_ref = np.floor(r_ref * 255) / 255
        np.testing.assert_allclose(o[..., 0], r_ref, atol=1e-6)

    def test_wavelet_constant_image(self):
        # zero-range channels must produce zeros, not NaN (reference normalize()
        # guards max==0, 分类/ROI_main.py:70-74)
        x = np.full((32, 32), 7.0, np.float32)
        out = np.asarray(ops.wavelet_enhance(jnp.asarray(x)))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out[..., 0], 0.0)


class TestBBox:
    def test_bbox_matches_numpy_where(self):
        m = np.zeros((224, 224), np.uint8)
        m[50:90, 60:120] = 1
        y0, y1, x0, x1, empty = ops.mask_to_bbox(jnp.asarray(m), padding=30)
        ys, xs = np.where(m == 1)
        assert int(y0) == max(ys.min() - 30, 0)
        assert int(y1) == min(ys.max() + 30, 224)
        assert int(x0) == max(xs.min() - 30, 0)
        assert int(x1) == min(xs.max() + 30, 224)
        assert not bool(empty)

    def test_bbox_clamping(self):
        m = np.zeros((100, 100), np.uint8)
        m[0:5, 95:100] = 1
        y0, y1, x0, x1, _ = ops.mask_to_bbox(jnp.asarray(m), padding=30)
        assert int(y0) == 0 and int(x1) == 100
        assert int(y1) == min(4 + 30, 100) and int(x0) == max(95 - 30, 0)

    def test_empty_mask_center_fallback(self):
        m = np.zeros((224, 224), np.uint8)
        y0, y1, x0, x1, empty = ops.mask_to_bbox(jnp.asarray(m))
        assert bool(empty)
        # reference fallback: center +- size//2 with size = min(h,w)//2 (roi.py:26-31)
        assert int(y0) == 112 - 56 // 2 * 2 // 2 or int(y0) == 112 - 56
        size = 224 // 2
        assert (int(y1) - int(y0)) == (size // 2) * 2
        assert int(x0) == 112 - size // 2

    def test_crop_and_resize_identity(self):
        img = rand(32, 32, 3)
        box = tuple(jnp.asarray(v) for v in (0, 32, 0, 32))
        out = ops.crop_and_resize(jnp.asarray(img), box, (32, 32))
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)

    def test_crop_and_resize_matches_cv2(self):
        import cv2
        img = rand(64, 80, 3)
        y0, y1, x0, x1 = 10, 50, 20, 70
        ref = cv2.resize(img[y0:y1, x0:x1], (224, 224), interpolation=cv2.INTER_LINEAR)
        box = tuple(jnp.asarray(v) for v in (y0, y1, x0, x1))
        got = np.asarray(ops.crop_and_resize(jnp.asarray(img), box, (224, 224)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_roi_from_mask_jits_and_vmaps(self):
        imgs = jnp.asarray(rand(4, 224, 224, 3))
        masks = jnp.zeros((4, 224, 224))
        masks = masks.at[0, 40:80, 50:90].set(1.0)

        fn = jax.jit(jax.vmap(lambda i, m: ops.roi_from_mask(i, m)[0]))
        crops = fn(imgs, masks)
        assert crops.shape == (4, 224, 224, 3)
        assert np.isfinite(np.asarray(crops)).all()


class TestCropMatmul:
    """crop_and_resize_matmul (the MXU weight-matrix form) vs the gather form:
    identical taps, one extra f32 rounding in the lerp."""

    def test_matches_gather_form(self):
        from unet_goolenet_tpu.ops.bbox import crop_and_resize, crop_and_resize_matmul

        rng = np.random.default_rng(9)
        img = jnp.asarray(rng.random((57, 43, 3)), jnp.float32)
        boxes = [
            (5, 30, 7, 40),     # interior box
            (0, 57, 0, 43),     # full image
            (10, 11, 20, 21),   # degenerate 1x1 box
            (50, 57, 0, 5),     # corner-clamped thin box
        ]
        for b in boxes:
            box = tuple(jnp.asarray(v, jnp.int32) for v in b)
            a = np.asarray(crop_and_resize(img, box, (32, 48)))
            m = np.asarray(crop_and_resize_matmul(img, box, (32, 48)))
            np.testing.assert_allclose(m, a, atol=1e-5, err_msg=str(b))

    def test_roi_from_mask_matmul_path(self):
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
        mask = jnp.zeros((64, 64)).at[20:40, 10:50].set(1.0)
        a, box_a = ops.roi_from_mask(img, mask, out_hw=(32, 32))
        m, box_m = ops.roi_from_mask(img, mask, out_hw=(32, 32), matmul=True)
        np.testing.assert_array_equal(np.asarray(box_m), np.asarray(box_a))
        np.testing.assert_allclose(np.asarray(m), np.asarray(a), atol=1e-5)

        # empty mask: centre-fallback box must go through the matmul crop too
        a, _ = ops.roi_from_mask(img, jnp.zeros((64, 64)), out_hw=(32, 32))
        m, _ = ops.roi_from_mask(img, jnp.zeros((64, 64)), out_hw=(32, 32),
                                 matmul=True)
        np.testing.assert_allclose(np.asarray(m), np.asarray(a), atol=1e-5)
