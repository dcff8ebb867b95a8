"""Fused two-stage pipeline tests (behavioural fixtures from SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from unet_goolenet_tpu.models import UNetTaskAligWeight, GoogLeNetClassifier
from unet_goolenet_tpu.pipeline import (
    TwoStagePipeline,
    preprocess_gray,
    preprocess_gray_padded,
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


def build_pipeline_kw(img_size=S, **kw):
    unet = UNetTaskAligWeight(n_classes=1)
    gnet = GoogLeNetClassifier(num_classes=6)
    uv = unet.init({"params": KEY}, jnp.zeros((1, img_size, img_size, 3)), train=False)
    gv = gnet.init({"params": KEY, "dropout": KEY},
                   jnp.zeros((1, img_size, img_size, 3)), train=False)
    return TwoStagePipeline(unet, uv, gnet, gv, img_size=img_size, **kw)


class TestPreprocess:
    def test_shapes_and_range(self):
        gray = jax.random.uniform(KEY, (2, 100, 120)) * 255
        out = preprocess_gray(gray, out_hw=(S, S))
        assert out.shape == (2, S, S, 3)
        o = np.asarray(out)
        assert o.min() >= -1e-3 and o.max() <= 1.0 + 1e-3

    def test_mxu_layout_matches_nhwc(self):
        """mxu_layout=True (NCHW resize, TwoStagePipeline's TPU default) is the
        same per-channel math as the NHWC path; parity on both ingest paths."""
        gray = jax.random.uniform(KEY, (2, 100, 120)) * 255
        a = np.asarray(preprocess_gray(gray, out_hw=(S, S)))
        b = np.asarray(preprocess_gray(gray, out_hw=(S, S), mxu_layout=True))
        np.testing.assert_allclose(b, a, atol=1e-5)

        vhw = jnp.asarray([[100, 120], [80, 100]], jnp.int32)
        pad = jnp.stack([gray[0], jnp.pad(gray[1, :80, :100],
                                          ((0, 20), (0, 20)), mode="edge")])
        a = np.asarray(preprocess_gray_padded(pad, vhw, out_hw=(S, S)))
        b = np.asarray(preprocess_gray_padded(pad, vhw, out_hw=(S, S),
                                              mxu_layout=True))
        np.testing.assert_allclose(b, a, atol=1e-5)

    def test_wavelet_then_resize_order(self):
        # wavelet at native res then resize != resize then wavelet; lock the former
        gray = (jax.random.uniform(KEY, (1, 96, 96)) * 255)
        a = preprocess_gray(gray, out_hw=(48, 48))
        from unet_goolenet_tpu import ops
        small = ops.resize_bilinear(gray[0], (48, 48), antialias=True)
        b = ops.wavelet_enhance(small)
        assert float(jnp.abs(a[0] - b).max()) > 1e-3


class TestPreprocessPadded:
    """Size-bucket preprocessing (apps/infer_e2e --size-buckets): images
    edge-padded into a shared bucket buffer must preprocess like their exact
    native-shape runs — up/downscale, odd and even native sizes."""

    def test_matches_exact_mixed_sizes(self):
        import numpy as np
        BH, BW = 128, 128
        for h, w in [(40, 48), (37, 53), (100, 120), (127, 99)]:
            gray = jax.random.uniform(jax.random.PRNGKey(h), (1, h, w)) * 255
            exact = np.asarray(preprocess_gray(gray, out_hw=(S, S)))
            gp = np.pad(np.asarray(gray[0]), ((0, BH - h), (0, BW - w)),
                        mode="edge")
            padded = np.asarray(preprocess_gray_padded(
                jnp.asarray(gp)[None], jnp.asarray([[h, w]], jnp.int32),
                out_hw=(S, S)))
            # interior is tap-for-tap identical; the last output row/col can
            # differ where the exact path's antialias kernel drops+renorms
            # out-of-range taps and the padded path samples edge-replicated
            # values instead (downscale only; upscale is bit-exact throughout)
            np.testing.assert_allclose(padded, exact, atol=5e-2)
            np.testing.assert_allclose(padded[:, :-1, :-1], exact[:, :-1, :-1],
                                       rtol=1e-4, atol=1e-5)

    def test_grades_padded_parity(self):
        pipe = build_pipeline()
        BH, BW = 128, 128
        sizes = [(40, 48), (37, 53), (100, 120), (64, 64)]
        grays = [np.asarray(jax.random.uniform(jax.random.PRNGKey(i), hw) * 255)
                 for i, hw in enumerate(sizes)]
        exact = [int(pipe.infer_grades(jnp.asarray(g)[None])[0]) for g in grays]
        batch = np.stack([
            np.pad(g, ((0, BH - g.shape[0]), (0, BW - g.shape[1])), mode="edge")
            for g in grays])
        valid = np.asarray(sizes, np.int32)
        got = list(np.asarray(pipe.infer_grades_padded(jnp.asarray(batch), valid)))
        assert got == exact, (got, exact)


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


class TestDenseBatchMin:
    def test_dense_branch_matches_packed(self):
        """dense_batch_min routes batches >= it to the dense engine forward;
        both layouts must grade identically (two_stage.py batch-aware policy,
        queue-5 measurement in benchmarks/RESULTS.md)."""
        pipe_p = build_pipeline()                       # CPU auto -> packed
        pipe_d = build_pipeline_kw(dense_batch_min=2)   # batch 2 -> dense
        assert pipe_p.dense_batch_min is None
        assert build_pipeline_kw(dense_batch_min=0).dense_batch_min is None
        gray = np.asarray(jax.random.uniform(KEY, (2, 40, 50), jnp.float32,
                                             0.0, 255.0))
        a = pipe_p.infer_from_gray(gray)
        d = pipe_d.infer_from_gray(gray)
        b1 = pipe_d.infer_from_gray(gray[:1])  # batch 1 < 2 -> packed branch
        np.testing.assert_array_equal(np.asarray(a["grades"]),
                                      np.asarray(d["grades"]))
        np.testing.assert_array_equal(np.asarray(b1["grades"]),
                                      np.asarray(a["grades"][:1]))
        np.testing.assert_allclose(np.asarray(a["masks"]),
                                   np.asarray(d["masks"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a["cls_logits"]),
                                   np.asarray(d["cls_logits"]),
                                   rtol=2e-3, atol=2e-4)


class TestMxuGlue:
    def test_mxu_pipeline_matches_default(self):
        """mxu_preprocess + mxu_roi (the TPU serving defaults) vs the plain
        paths: full e2e outputs must agree — grades exactly, crops/boxes to
        float tolerance."""
        ref = build_pipeline_kw(mxu_preprocess=False, mxu_roi=False)
        mxu = build_pipeline_kw(mxu_preprocess=True, mxu_roi=True)
        mxu.unet_vars, mxu.gnet_vars = ref.unet_vars, ref.gnet_vars
        gray = jax.random.uniform(KEY, (3, 100, 120)) * 255
        a = ref.infer_from_gray(gray)
        b = mxu.infer_from_gray(gray)
        np.testing.assert_array_equal(np.asarray(b["grades"]),
                                      np.asarray(a["grades"]))
        np.testing.assert_array_equal(np.asarray(b["boxes"]),
                                      np.asarray(a["boxes"]))
        np.testing.assert_allclose(np.asarray(b["seg_logits"]),
                                   np.asarray(a["seg_logits"]), atol=1e-3)

    def test_fast_resize_optin(self):
        """fast_resize=True (bf16-precision resize dots, opt-in — RESULTS.md
        queue 18) builds and grades; on CPU the precision hint is a no-op so
        outputs match the mxu default exactly."""
        ref = build_pipeline_kw(mxu_preprocess=True, mxu_roi=True)
        fast = build_pipeline_kw(mxu_preprocess=True, mxu_roi=True,
                                 fast_resize=True)
        assert fast.fast_resize
        fast.unet_vars, fast.gnet_vars = ref.unet_vars, ref.gnet_vars
        gray = jax.random.uniform(KEY, (2, 100, 120)) * 255
        a = ref.infer_from_gray(gray)
        b = fast.infer_from_gray(gray)
        np.testing.assert_array_equal(np.asarray(b["grades"]),
                                      np.asarray(a["grades"]))
        # fast_resize only applies on the mxu path: without it, the flag is
        # inert (guard against silently shipping it into the parity path)
        plain = build_pipeline_kw(mxu_preprocess=False, fast_resize=True)
        assert not plain.fast_resize
