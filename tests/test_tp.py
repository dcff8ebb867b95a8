"""Tensor-parallel sharding tests on the 8-device virtual mesh: a (4 data x
2 model) tp+dp train step must match single-device training numerically."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from unet_goolenet_tpu.models import GoogLeNetClassifier, UNetTaskAligWeight
from unet_goolenet_tpu.parallel import (
    make_mesh,
    shard_batch,
    replicate,
    make_param_shardings,
    shard_params,
    make_tp_dp_cls_train_step,
    make_tp_dp_seg_train_step,
)
from unet_goolenet_tpu.train import optim
from unet_goolenet_tpu.train.cls import init_cls_state, make_cls_train_step
from unet_goolenet_tpu.train.seg import TrainState, init_seg_state, make_seg_train_step

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=4, n_model=2)


class TestShardingRules:
    def test_attention_and_mlp_sharded(self, mesh):
        model = UNetTaskAligWeight(n_classes=1)
        variables = model.init({"params": KEY}, jnp.zeros((1, 32, 32, 3)), train=False)
        sh = make_param_shardings(mesh, variables["params"])
        layer = sh["task2"]["layer0"]
        assert layer["attention1"]["to_qkv"]["kernel"].spec == P(None, "model")
        assert layer["attention1"]["to_out"]["kernel"].spec == P("model", None)
        assert layer["x_feed"]["fc1"]["kernel"].spec == P(None, "model")
        assert layer["x_feed"]["fc2"]["kernel"].spec == P("model", None)
        # deep conv sharded on output channels (HWIO last axis)
        deep = sh["trunk"]["down4"]["nConvs"]["block0"]["conv"]["conv"]["kernel"]
        assert deep.spec == P(None, None, None, "model")
        # small layers replicated
        assert sh["outc"]["conv"]["kernel"].spec == P()

    def test_head_divisibility(self, mesh):
        # 8 heads / model=2 -> 4 heads per shard; qkv feature dim divisible
        model = UNetTaskAligWeight(n_classes=1)
        variables = model.init({"params": KEY}, jnp.zeros((1, 32, 32, 3)), train=False)
        qkv = variables["params"]["task2"]["layer0"]["attention1"]["to_qkv"]["kernel"]
        assert qkv.shape[-1] % 2 == 0


class TestTpDpStep:
    def test_matches_single_device(self, mesh):
        model = UNetTaskAligWeight(n_classes=1)
        tx = optim.make_adamw(1e-4)
        state = init_seg_state(model, tx, KEY, input_shape=(1, 16, 16, 3))

        imgs = jax.random.uniform(KEY, (8, 16, 16, 3))
        labels = (jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 1)) > 0.5
                  ).astype(jnp.float32)

        ref_step = jax.jit(make_seg_train_step(model, tx))
        ref_state, ref_metrics = ref_step(state, imgs, labels)

        params = shard_params(mesh, state.params)
        stats = replicate(mesh, state.batch_stats)
        opt_state = tx.init(params)  # moments inherit param shardings
        tp_state = TrainState(params, stats, opt_state)
        batch = shard_batch(mesh, {"i": imgs, "l": labels})

        step = make_tp_dp_seg_train_step(model, tx, mesh)
        tp_state, tp_metrics = step(tp_state, batch["i"], batch["l"])

        np.testing.assert_allclose(float(ref_metrics["loss"]),
                                   float(tp_metrics["loss"]), rtol=1e-3)
        # AdamW's first step is ~sign(g)*lr; f32 reduction-order noise across
        # shards can flip it where g ~ 0, so tolerance is two refinement steps of size lr=1e-4 each, worst case 2*2*lr
        for a, b in zip(jax.tree_util.tree_leaves(ref_state.params)[:5],
                        jax.tree_util.tree_leaves(tp_state.params)[:5]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=4.5e-4)

    def test_googlenet_wide_tail_sharded(self, mesh):
        gnet = GoogLeNetClassifier(num_classes=6)
        variables = gnet.init({"params": KEY, "dropout": KEY},
                              jnp.zeros((1, 64, 64, 3)), train=False)
        sh = make_param_shardings(mesh, variables["params"])
        g = sh["googlenet"]
        # wide-tail branch convs column-sharded (HWIO last axis over 'model')
        for mod in ("inception4e", "inception5a", "inception5b"):
            for br in ("branch1", "branch2_0", "branch2_1",
                       "branch3_0", "branch3_1", "branch4_1"):
                spec = g[mod][br]["conv"]["conv"]["kernel"].spec
                assert spec == P(None, None, None, "model"), (mod, br, spec)
        # early modules, stem, and fc replicated
        assert g["inception3a"]["branch1"]["conv"]["conv"]["kernel"].spec == P()
        assert g["conv1"]["conv"]["conv"]["kernel"].spec == P()
        assert g["fc"]["kernel"].spec == P()

    def test_googlenet_tp_matches_single_device(self, mesh):
        gnet = GoogLeNetClassifier(num_classes=6)
        tx = optim.make_adamw(1e-4)
        state = init_cls_state(gnet, tx, KEY, input_shape=(1, 64, 64, 3))

        imgs = jax.random.uniform(KEY, (8, 64, 64, 3))
        labels = jax.random.randint(jax.random.PRNGKey(1), (8,), 0, 6)
        se_out = jax.random.normal(jax.random.PRNGKey(2), (8, 64, 64, 1))
        rng = jax.random.PRNGKey(3)

        ref_step = jax.jit(make_cls_train_step(gnet, tx))
        ref_state, ref_metrics = ref_step(state, imgs, labels, se_out, rng)

        params = shard_params(mesh, state.params)
        stats = replicate(mesh, state.batch_stats)
        opt_state = tx.init(params)
        tp_state = TrainState(params, stats, opt_state)
        batch = shard_batch(mesh, {"i": imgs, "l": labels, "s": se_out})

        step = make_tp_dp_cls_train_step(gnet, tx, mesh)
        tp_state, tp_metrics = step(tp_state, batch["i"], batch["l"],
                                    batch["s"], rng)

        # the reported loss is the REFINEMENT (2nd) pass's, i.e. computed after
        # one AdamW update; near-zero grads flip their ~sign(g)*lr first step
        # under cross-shard f32 reduction reordering, and ~6M perturbed params
        # move the pass-2 loss by a few tenths of a percent (measured 0.20%).
        # A real sharding bug (missing psum) shows up at ~2x, far above this.
        np.testing.assert_allclose(float(ref_metrics["loss"]),
                                   float(tp_metrics["loss"]), rtol=6e-3)
        wide = tp_state.params["googlenet"]["inception5b"]["branch2_1"]
        ref_wide = ref_state.params["googlenet"]["inception5b"]["branch2_1"]
        np.testing.assert_allclose(
            np.asarray(wide["conv"]["conv"]["kernel"]),
            np.asarray(ref_wide["conv"]["conv"]["kernel"]),
            rtol=2e-3, atol=4.5e-4)

    def test_param_shardings_stick(self, mesh):
        model = UNetTaskAligWeight(n_classes=1)
        variables = model.init({"params": KEY}, jnp.zeros((1, 16, 16, 3)), train=False)
        params = shard_params(mesh, variables["params"])
        qkv = params["task2"]["layer0"]["attention1"]["to_qkv"]["kernel"]
        assert qkv.sharding.spec == P(None, "model")
        assert len(qkv.sharding.device_set) == 8
