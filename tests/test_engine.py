"""Inference-engine parity: the ops-level forward must match flax apply()."""

import numpy as np
import jax
import jax.numpy as jnp

from unet_goolenet_tpu.models import GoogLeNetClassifier, UNetTaskAligWeight
from unet_goolenet_tpu.pipeline import engine

KEY = jax.random.PRNGKey(0)


class TestEngine:
    def test_matches_flax_apply(self):
        model = UNetTaskAligWeight(n_classes=1)
        x = jax.random.uniform(KEY, (2, 64, 64, 3))
        variables = model.init({"params": KEY}, x, train=False)
        # give batch stats non-trivial values
        _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": mut["batch_stats"]}

        ref = model.apply(variables, x, train=False)
        got = engine.unet_forward(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-4)

    def test_gnet_matches_flax_apply(self):
        gnet = GoogLeNetClassifier(num_classes=6)
        x = jax.random.uniform(KEY, (2, 96, 96, 3))
        variables = gnet.init({"params": KEY, "dropout": KEY}, x, train=False)
        _, mut = gnet.apply(variables, x, train=True, mutable=["batch_stats"],
                            rngs={"dropout": KEY})
        variables = {"params": variables["params"],
                     "batch_stats": mut["batch_stats"]}

        ref = gnet.apply(variables, x, train=False)
        got = engine.gnet_forward(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-4)

    def test_gnet_s2d_stem_matches_plain(self):
        """The space-to-depth stem conv (serving TPU default) reads the same
        taps as the plain 7x7/2 conv; logits must match to float tolerance."""
        gnet = GoogLeNetClassifier(num_classes=6)
        x = jax.random.uniform(KEY, (2, 96, 96, 3))
        variables = gnet.init({"params": KEY, "dropout": KEY}, x, train=False)
        ref = engine.gnet_forward(variables, x)
        got = engine.gnet_forward(variables, x, s2d_stem=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-4)

    def test_gnet_merge_1x1_matches_plain(self):
        """merge_1x1 (one conv with concatenated output channels for the
        three same-input inception 1x1s) is exact math — logits identical."""
        gnet = GoogLeNetClassifier(num_classes=6)
        x = jax.random.uniform(KEY, (2, 96, 96, 3))
        variables = gnet.init({"params": KEY, "dropout": KEY}, x, train=False)
        ref = engine.gnet_forward(variables, x)
        got = engine.gnet_forward(variables, x, merge_1x1=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_pipeline_engine_grade_parity(self):
        # the serving pipeline defaults to the folded engine; grades must match
        # the flax-apply pipeline on the same inputs
        from unet_goolenet_tpu.pipeline import TwoStagePipeline

        unet = UNetTaskAligWeight(n_classes=1)
        gnet = GoogLeNetClassifier(num_classes=6)
        uv = unet.init({"params": KEY}, jnp.zeros((1, 32, 32, 3)), train=False)
        gv = gnet.init({"params": KEY, "dropout": KEY},
                       jnp.zeros((1, 32, 32, 3)), train=False)
        gray = jax.random.uniform(jax.random.PRNGKey(3), (4, 48, 56), jnp.float32,
                                  0.0, 255.0)
        out_e = TwoStagePipeline(unet, uv, gnet, gv, img_size=32,
                                 use_engine=True).infer_from_gray(gray)
        out_f = TwoStagePipeline(unet, uv, gnet, gv, img_size=32,
                                 use_engine=False).infer_from_gray(gray)
        np.testing.assert_array_equal(np.asarray(out_e["grades"]),
                                      np.asarray(out_f["grades"]))
        np.testing.assert_array_equal(np.asarray(out_e["masks"]),
                                      np.asarray(out_f["masks"]))
        np.testing.assert_allclose(np.asarray(out_e["cls_logits"]),
                                   np.asarray(out_f["cls_logits"]),
                                   rtol=2e-3, atol=2e-3)

    def test_jittable_and_deterministic(self):
        model = UNetTaskAligWeight(n_classes=1)
        x = jax.random.uniform(KEY, (1, 32, 32, 3))
        variables = model.init({"params": KEY}, x, train=False)
        f = jax.jit(engine.unet_forward)
        a = f(variables, x)
        b = f(variables, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPackedForward:
    def test_packed_matches_dense_engine(self):
        """unet_forward_packed == unet_forward up to f32 summation order."""
        model = UNetTaskAligWeight(n_classes=1)
        x = jax.random.uniform(KEY, (2, 64, 64, 3))
        variables = model.init({"params": KEY}, x, train=False)
        _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mut["batch_stats"]}
        ref = engine.unet_forward(variables, x)
        got = engine.unet_forward_packed(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_packed_matches_flax_apply_bf16(self):
        model = UNetTaskAligWeight(n_classes=1, dtype=jnp.bfloat16)
        x = jax.random.uniform(KEY, (1, 64, 64, 3)).astype(jnp.bfloat16)
        variables = model.init({"params": KEY}, x, train=False)
        ref = model.apply(variables, x, train=False)
        got = engine.unet_forward_packed(variables, x)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=1e-1, atol=1e-1)


class TestFusedUp1Tail:
    def test_fused_tail_matches_packed_engine(self):
        """unet_forward_packed(fused_up1=True) (the Pallas up1+outc tail,
        interpret mode on CPU) == the XLA packed forward up to f32 summation
        order."""
        from unet_goolenet_tpu.ops import pallas as pk

        pk.interpret_mode(True)
        model = UNetTaskAligWeight(n_classes=1)
        x = jax.random.uniform(KEY, (2, 64, 64, 3))
        variables = model.init({"params": KEY}, x, train=False)
        _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mut["batch_stats"]}
        ref = engine.unet_forward_packed(variables, x)
        got = engine.unet_forward_packed(variables, x, fused_up1=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_hybrid_dense_fused_tail_matches_dense(self):
        """unet_forward(fused_up1=True) — the dense trunk + packed fused
        up1+outc tail hybrid — == the plain dense engine forward up to f32
        summation order (pack/unpack are exact reshapes); likewise the up2
        switch-point variants ("packed" all-XLA and "fused" Pallas up2)."""
        from unet_goolenet_tpu.ops import pallas as pk

        pk.interpret_mode(True)
        model = UNetTaskAligWeight(n_classes=1)
        x = jax.random.uniform(KEY, (2, 64, 64, 3))
        variables = model.init({"params": KEY}, x, train=False)
        _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mut["batch_stats"]}
        ref = engine.unet_forward(variables, x)
        for kw in (dict(fused_up1=True),
                   dict(fused_up1=True, up2="packed"),
                   dict(fused_up1=True, up2="fused"),
                   dict(fused_up1=True, up2="fused_dense"),
                   dict(fused_up1=True, fused_up34=True)):
            got = engine.unet_forward(variables, x, **kw)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-5, err_msg=str(kw))
