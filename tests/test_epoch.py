"""Device-resident epoch runner tests."""

import numpy as np
import jax
import jax.numpy as jnp

from unet_goolenet_tpu.models import UNetTaskAligWeight
from unet_goolenet_tpu.train import optim
from unet_goolenet_tpu.train.epoch import make_epoch_runner
from unet_goolenet_tpu.train.seg import init_seg_state, make_seg_train_step

KEY = jax.random.PRNGKey(0)


class TestEpochRunner:
    def test_matches_python_loop(self):
        model = UNetTaskAligWeight(n_classes=1)
        tx = optim.make_adamw(1e-4)
        state = init_seg_state(model, tx, KEY, input_shape=(1, 16, 16, 3))
        step = make_seg_train_step(model, tx)

        imgs = jax.random.uniform(KEY, (6, 16, 16, 3))
        labels = (jax.random.uniform(jax.random.PRNGKey(1), (6, 16, 16, 1)) > 0.5
                  ).astype(jnp.float32)

        run = make_epoch_runner(step, batch_size=2)
        ekey = jax.random.PRNGKey(7)
        s_scan, loss_scan = run(state, imgs, labels, ekey)

        # replicate the same shuffling + stepping in a python loop
        perm = np.asarray(jax.random.permutation(ekey, 6))
        s_ref = state
        losses = []
        jstep = jax.jit(step)
        for b in range(3):
            idx = perm[b * 2:(b + 1) * 2]
            s_ref, m = jstep(s_ref, imgs[idx], labels[idx])
            losses.append(float(m["loss"]))
        # scan-fused compilation reassociates f32 reductions vs the per-step jit,
        # and AdamW's ~sign(g)*lr updates amplify that on near-zero grads: compare
        # to reassociation/step-size tolerance, not bitwise
        np.testing.assert_allclose(float(loss_scan), np.mean(losses), rtol=1e-2)
        a = jax.tree_util.tree_leaves(s_scan.params)[0]
        b_ = jax.tree_util.tree_leaves(s_ref.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-2, atol=7e-4)

    def test_drop_last(self):
        model = UNetTaskAligWeight(n_classes=1)
        tx = optim.make_adamw(1e-4)
        state = init_seg_state(model, tx, KEY, input_shape=(1, 16, 16, 3))
        run = make_epoch_runner(make_seg_train_step(model, tx), batch_size=4)
        imgs = jax.random.uniform(KEY, (7, 16, 16, 3))  # 7 -> one batch of 4
        labels = jnp.zeros((7, 16, 16, 1))
        _, loss = run(state, imgs, labels, KEY)
        assert np.isfinite(float(loss))
