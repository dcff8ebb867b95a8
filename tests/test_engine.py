"""Inference-engine parity: the ops-level forward must match flax apply()."""

import numpy as np
import jax
import jax.numpy as jnp

from unet_goolenet_tpu.models import UNetTaskAligWeight
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

    def test_jittable_and_deterministic(self):
        model = UNetTaskAligWeight(n_classes=1)
        x = jax.random.uniform(KEY, (1, 32, 32, 3))
        variables = model.init({"params": KEY}, x, train=False)
        f = jax.jit(engine.unet_forward)
        a = f(variables, x)
        b = f(variables, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
