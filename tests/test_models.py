"""Model-level tests: shapes, jit-ability, train/eval mode behaviour, and
independent numpy oracles for the attention math."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unet_goolenet_tpu.models import (
    UNetBasic,
    UNetTask,
    UNetTaskAlig,
    UNetTaskAligWeight,
    GoogLeNet,
    GoogLeNetClassifier,
)
from unet_goolenet_tpu.nn import TransformerDecoder, SelfAttention

KEY = jax.random.PRNGKey(0)


def init_and_run(model, x, train=False, **kwargs):
    variables = model.init({"params": KEY, "dropout": KEY}, x, train=False)
    if train:
        out, mut = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": KEY}, **kwargs)
        return out, variables, mut
    return model.apply(variables, x, train=False, **kwargs), variables, None


class TestUNets:
    def test_flagship_shapes(self):
        x = jnp.zeros((2, 64, 64, 3))
        logits, variables, _ = init_and_run(UNetTaskAligWeight(n_classes=1), x)
        assert logits.shape == (2, 64, 64, 1)

    def test_flagship_224_single(self):
        x = jnp.zeros((1, 224, 224, 3))
        logits, _, _ = init_and_run(UNetTaskAligWeight(n_classes=1), x)
        assert logits.shape == (1, 224, 224, 1)

    @pytest.mark.parametrize("cls", [UNetBasic, UNetTask, UNetTaskAlig])
    def test_dual_head_variants(self, cls):
        x = jnp.zeros((1, 64, 64, 3))
        (logits, cl_out), _, _ = init_and_run(cls(n_classes=1), x)
        assert logits.shape == (1, 64, 64, 1)
        assert cl_out.shape == (1, 1)

    def test_train_mode_updates_batch_stats(self):
        x = jax.random.normal(KEY, (2, 64, 64, 3))
        model = UNetTaskAligWeight()
        variables = model.init({"params": KEY}, x, train=False)
        _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(mut["batch_stats"])
        # at least some running stats must have moved
        moved = any(not np.allclose(a, b) for a, b in zip(old, new))
        assert moved

    def test_eval_deterministic_and_jittable(self):
        x = jax.random.normal(KEY, (1, 64, 64, 3))
        model = UNetTaskAligWeight()
        variables = model.init({"params": KEY}, x, train=False)
        f = jax.jit(lambda v, t: model.apply(v, t, train=False))
        a = f(variables, x)
        b = f(variables, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_param_count_flagship(self):
        """Catches silent architecture drift. Trunk+decoder+bottleneck of the
        reference model (minus its never-used fc1/fc2/DeformConv2d params, which we
        deliberately do not declare)."""
        x = jnp.zeros((1, 64, 64, 3))
        model = UNetTaskAligWeight()
        variables = model.init({"params": KEY}, x, train=False)
        n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
        # independently computed from the architecture spec; see docstring
        assert 30_000_000 < n < 50_000_000, n


class TestGoogLeNet:
    def test_classifier_shapes(self):
        x = jnp.zeros((2, 224, 224, 3))
        logits, _, _ = init_and_run(GoogLeNetClassifier(num_classes=6), x)
        assert logits.shape == (2, 6)

    def test_aux_heads(self):
        x = jnp.zeros((1, 224, 224, 3))
        model = GoogLeNet(num_classes=6, aux_logits=True, transform_input=False)
        variables = model.init({"params": KEY, "dropout": KEY}, x, train=False)
        main, aux2, aux1 = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": KEY})[0]
        assert main.shape == (1, 6) and aux1.shape == (1, 6) and aux2.shape == (1, 6)

    def test_param_count_vs_torchvision(self):
        # torchvision googlenet (no aux) has 6,624,904 params at 1000 classes;
        # swapping fc to 6 classes: 6,624,904 - (1024*1000+1000) + (1024*6+6)
        x = jnp.zeros((1, 224, 224, 3))
        model = GoogLeNetClassifier(num_classes=6)
        variables = model.init({"params": KEY, "dropout": KEY}, x, train=False)
        n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
        assert n == 6_624_904 - (1024 * 1000 + 1000) + (1024 * 6 + 6), n

    def test_transform_input(self):
        from unet_goolenet_tpu.models.googlenet import _transform_input
        x = jnp.full((1, 2, 2, 3), 0.5)
        y = _transform_input(x)
        np.testing.assert_allclose(
            np.asarray(y[0, 0, 0]),
            [0.5 * 0.229 / 0.5 + (0.485 - 0.5) / 0.5,
             0.5 * 0.224 / 0.5 + (0.456 - 0.5) / 0.5,
             0.5 * 0.225 / 0.5 + (0.406 - 0.5) / 0.5],
            rtol=1e-6)


class TestTransformer:
    def test_self_attention_matches_numpy_oracle(self):
        dim, heads, dim_head, n = 32, 4, 8, 10
        x = jax.random.normal(KEY, (2, n, dim))
        model = SelfAttention(dim, heads, dim_head)
        variables = model.init({"params": KEY}, x)
        out = model.apply(variables, x)

        # independent numpy computation, including the dim**-0.5 scale quirk
        p = jax.tree_util.tree_map(np.asarray, variables["params"])
        qkv = np.asarray(x) @ p["to_qkv"]["kernel"]
        q, k, v = np.split(qkv, 3, axis=-1)

        def heads_split(t):
            b, nn_, hd = t.shape
            return t.reshape(b, nn_, heads, hd // heads).transpose(0, 2, 1, 3)

        qh, kh, vh = map(heads_split, (q, k, v))
        logits = np.einsum("bhid,bhjd->bhij", qh, kh) * dim ** -0.5
        attn = np.exp(logits - logits.max(-1, keepdims=True))
        attn /= attn.sum(-1, keepdims=True)
        o = np.einsum("bhij,bhjd->bhid", attn, vh)
        o = o.transpose(0, 2, 1, 3).reshape(2, n, heads * dim_head)
        expected = o @ p["to_out"]["kernel"] + p["to_out"]["bias"]
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-5)

    def test_decoder_shapes_and_cross_weight_sharing(self):
        x = jax.random.normal(KEY, (1, 4, 4, 32))
        model = TransformerDecoder(dim=32, depth=2, heads=4, dim_head=8,
                                   mlp_dim=64, pos_size=4)
        variables = model.init({"params": KEY}, x, x)
        a, b = model.apply(variables, x, x)
        assert a.shape == b.shape == (1, 4, 4, 32)
        layer = variables["params"]["layer0"]
        # one shared cross-attention module, used in both directions (quirk parity)
        assert "cross_attention_cl" in layer
        assert "cross_attention_seg" not in layer

    def test_pos_embeddings_zero_init(self):
        x = jnp.zeros((1, 4, 4, 16))
        model = TransformerDecoder(dim=16, depth=1, heads=2, dim_head=8,
                                   mlp_dim=32, pos_size=4)
        variables = model.init({"params": KEY}, x, x)
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["pos_embedding_cl"]), 0.0)
