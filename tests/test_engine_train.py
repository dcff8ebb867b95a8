"""Train-mode engine parity: the packed train forward must match
flax model.apply(train=True, mutable=['batch_stats']) — logits, every updated
running statistic, AND gradients — so the engine-packed train step is a
drop-in for the flax one (pipeline/engine_train.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from unet_goolenet_tpu.models import UNetTaskAligWeight
from unet_goolenet_tpu.pipeline.engine_train import unet_forward_packed_train
from unet_goolenet_tpu.train import optim
from unet_goolenet_tpu.train.seg import init_seg_state, make_seg_train_step

KEY = jax.random.PRNGKey(0)


def setup(size=64, batch=2):
    model = UNetTaskAligWeight(n_classes=1)
    x = jax.random.uniform(KEY, (batch, size, size, 3))
    variables = model.init({"params": KEY}, x, train=False)
    # advance stats once so running mean/var are non-trivial
    _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    return model, variables["params"], mut["batch_stats"], x


def flax_fwd(model, params, stats, x):
    out, mut = model.apply({"params": params, "batch_stats": stats}, x,
                           train=True, mutable=["batch_stats"])
    return out, mut["batch_stats"]


class TestTrainForwardParity:
    def test_logits_and_stats_match_flax(self):
        model, params, stats, x = setup()
        ref_out, ref_stats = flax_fwd(model, params, stats, x)
        got_out, got_stats = unet_forward_packed_train(params, stats, x)
        np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                                   rtol=2e-3, atol=2e-4)
        flat_ref = jax.tree_util.tree_flatten_with_path(ref_stats)[0]
        flat_got = jax.tree_util.tree_flatten_with_path(got_stats)[0]
        assert [p for p, _ in flat_ref] == [p for p, _ in flat_got]
        for (path, r), (_, g) in zip(flat_ref, flat_got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(path))

    def test_dense_up1_tail_matches_flax(self):
        """dense_up1=True (dense 64-channel up1+outc tail — the queue-19
        backward-attribution lever) keeps logits and batch-stats parity."""
        model, params, stats, x = setup()
        ref_out, ref_stats = flax_fwd(model, params, stats, x)
        got_out, got_stats = unet_forward_packed_train(params, stats, x,
                                                      dense_up1=True)
        np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                                   rtol=2e-3, atol=2e-4)
        flat_ref = jax.tree_util.tree_flatten_with_path(ref_stats)[0]
        flat_got = jax.tree_util.tree_flatten_with_path(got_stats)[0]
        assert [p for p, _ in flat_ref] == [p for p, _ in flat_got]
        for (path, r), (_, g) in zip(flat_ref, flat_got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(path))

    def test_gradients_match_flax(self):
        model, params, stats, x = setup(size=32)
        labels = (jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1))
                  > 0.7).astype(jnp.float32)

        def loss_flax(p):
            out, _ = flax_fwd(model, p, stats, x)
            return jnp.mean((jax.nn.sigmoid(out) - labels) ** 2)

        def loss_engine(p):
            out, _ = unet_forward_packed_train(p, stats, x)
            return jnp.mean((jax.nn.sigmoid(out) - labels) ** 2)

        lr, gr = jax.value_and_grad(loss_flax)(params)
        le, ge = jax.value_and_grad(loss_engine)(params)
        np.testing.assert_allclose(float(le), float(lr), rtol=1e-5)
        flat_r = jax.tree_util.tree_flatten_with_path(gr)[0]
        flat_e = jax.tree_util.tree_flatten_with_path(ge)[0]
        # leaf-scaled infinity norm: per-element rtol is meaningless for
        # near-zero elements (conv biases ahead of BN are mathematically-zero
        # grads; deep-chain f32 summation noise reaches ~3e-5 abs on leaves
        # whose largest grads are ~1e-2). A sign/indexing bug moves a leaf by
        # O(its own max), orders of magnitude above 1% of it.
        for (path, r), (_, e) in zip(flat_r, flat_e):
            r = np.asarray(r)
            e = np.asarray(e)
            err = np.abs(e - r).max()
            bound = max(1e-2 * np.abs(r).max(), 1e-6)
            assert err <= bound, (
                f"{jax.tree_util.keystr(path)}: max|Δ|={err:.3e} > {bound:.3e}"
                f" (leaf |g|max={np.abs(r).max():.3e})")


class TestRematParity:
    """jax.checkpoint on engine levels must change ONLY the autodiff
    schedule: forward values identical, gradients identical to float noise
    (engine_train.unet_forward_packed_train remat=...)."""

    def test_level_remat_matches_no_remat(self):
        model, params, stats, x = setup(size=32)
        labels = (jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1))
                  > 0.7).astype(jnp.float32)

        def make_loss(remat):
            def loss(p):
                out, _ = unet_forward_packed_train(p, stats, x, remat=remat)
                return jnp.mean((jax.nn.sigmoid(out) - labels) ** 2)
            return loss

        l0, g0 = jax.value_and_grad(make_loss(()))(params)
        flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
        for remat in [("up1",), ("up2",), ("inc",), ("up1", "up2", "inc")]:
            l1, g1 = jax.value_and_grad(make_loss(remat))(params)
            np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6,
                                       err_msg=str(remat))
            flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
            for (path, r), (_, e) in zip(flat0, flat1):
                r, e = np.asarray(r), np.asarray(e)
                bound = max(1e-4 * np.abs(r).max(), 1e-7)
                assert np.abs(e - r).max() <= bound, (
                    f"remat={remat} {jax.tree_util.keystr(path)}")

    def test_step_with_remat_all(self):
        model = UNetTaskAligWeight(n_classes=1)
        tx = optim.make_adamw(1e-4)
        state = init_seg_state(model, tx, KEY, input_shape=(1, 32, 32, 3))
        imgs = jax.random.uniform(KEY, (2, 32, 32, 3))
        labels = (jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1))
                  > 0.7).astype(jnp.float32)
        step = jax.jit(make_seg_train_step(model, tx,
                                           forward="engine-packed"))
        step_r = jax.jit(make_seg_train_step(model, tx,
                                             forward="engine-packed",
                                             remat=("all",)))
        _, m = step(state, imgs, labels)
        _, mr = step_r(state, imgs, labels)
        np.testing.assert_allclose(float(mr["loss"]), float(m["loss"]),
                                   rtol=1e-5)

    def test_step_with_remat_first_pass_only(self):
        """remat=('first',) checkpoints ONLY the refinement's pass-0 forward
        (train/seg.py; VERDICT r3 ask #7): identical metrics AND identical
        updated params to the no-remat step."""
        model = UNetTaskAligWeight(n_classes=1)
        tx = optim.make_adamw(1e-4)
        state = init_seg_state(model, tx, KEY, input_shape=(1, 32, 32, 3))
        imgs = jax.random.uniform(KEY, (2, 32, 32, 3))
        labels = (jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1))
                  > 0.7).astype(jnp.float32)
        step = jax.jit(make_seg_train_step(model, tx,
                                           forward="engine-packed"))
        step_r = jax.jit(make_seg_train_step(model, tx,
                                             forward="engine-packed",
                                             remat=("first",)))
        s0, m = step(state, imgs, labels)
        s1, mr = step_r(state, imgs, labels)
        np.testing.assert_allclose(float(mr["loss"]), float(m["loss"]),
                                   rtol=1e-6)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(s0.params)[0],
                jax.tree_util.tree_flatten_with_path(s1.params)[0]):
            a, b = np.asarray(a), np.asarray(b)
            bound = max(1e-5 * np.abs(a).max(), 1e-8)
            assert np.abs(a - b).max() <= bound, jax.tree_util.keystr(path)


class TestEnginePackedTrainStep:
    def test_step_matches_flax_step(self):
        """Full refinement train step: engine-packed vs flax, same state in,
        near-identical loss out."""
        model = UNetTaskAligWeight(n_classes=1)
        tx = optim.make_adamw(1e-4)
        state = init_seg_state(model, tx, KEY, input_shape=(1, 32, 32, 3))
        imgs = jax.random.uniform(KEY, (2, 32, 32, 3))
        labels = (jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1))
                  > 0.7).astype(jnp.float32)
        # single-pass step: no optimizer-update amplification -> tight
        step_f1 = jax.jit(make_seg_train_step(model, tx, n_refine=1))
        step_e1 = jax.jit(make_seg_train_step(model, tx, n_refine=1,
                                              forward="engine-packed"))
        _, mf1 = step_f1(state, imgs, labels)
        _, me1 = step_e1(state, imgs, labels)
        np.testing.assert_allclose(float(me1["loss"]), float(mf1["loss"]),
                                   rtol=1e-5)
        # full refinement step: the pass-2 loss is computed AFTER an AdamW
        # update, where ~sign(g)*lr on near-zero grads amplifies f32 noise
        # (same effect and tolerance as tests/test_tp.py's tp+dp step)
        step_f = jax.jit(make_seg_train_step(model, tx))
        step_e = jax.jit(make_seg_train_step(model, tx,
                                             forward="engine-packed"))
        sf, mf = step_f(state, imgs, labels)
        se, me = step_e(state, imgs, labels)
        np.testing.assert_allclose(float(me["loss"]), float(mf["loss"]),
                                   rtol=6e-3)
        _, mf2 = step_f(sf, imgs, labels)
        _, me2 = step_e(se, imgs, labels)
        np.testing.assert_allclose(float(me2["loss"]), float(mf2["loss"]),
                                   rtol=6e-3)

    def test_bf16_step_runs_and_learns(self):
        model = UNetTaskAligWeight(n_classes=1, dtype=jnp.bfloat16)
        tx = optim.make_adamw(1e-3)
        state = init_seg_state(model, tx, KEY, input_shape=(1, 32, 32, 3))
        imgs = jax.random.uniform(KEY, (2, 32, 32, 3)).astype(jnp.bfloat16)
        labels = (imgs.mean(axis=-1, keepdims=True) > 0.5).astype(jnp.float32)
        step = jax.jit(make_seg_train_step(model, tx,
                                           forward="engine-packed"))
        losses = []
        for _ in range(6):
            state, metrics = step(state, imgs, labels)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
