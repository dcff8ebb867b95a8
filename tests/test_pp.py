"""Pipeline-parallel (GPipe-style) two-stage serving: grade parity vs the
single-device fused graph on the virtual CPU mesh (parallel/pp.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_goolenet_tpu.models import GoogLeNetClassifier, UNetTaskAligWeight
from unet_goolenet_tpu.parallel.pp import make_pp_pipeline, make_stage_mesh
from unet_goolenet_tpu.pipeline import TwoStagePipeline

KEY = jax.random.PRNGKey(0)
SIZE = 64


@pytest.fixture(scope="module")
def pipe():
    unet = UNetTaskAligWeight(n_classes=1)
    gnet = GoogLeNetClassifier(num_classes=6)
    uv = unet.init({"params": KEY}, jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    gv = gnet.init({"params": KEY, "dropout": KEY},
                   jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    return TwoStagePipeline(unet, uv, gnet, gv, img_size=SIZE)


class TestPipelineParallel:
    def test_grade_parity_vs_single_device(self, pipe):
        assert len(jax.devices()) >= 2, "conftest forces an 8-device CPU mesh"
        mesh = make_stage_mesh()
        run = make_pp_pipeline(pipe, mesh)
        grays = jax.random.uniform(KEY, (3, 2, 80, 100), jnp.float32, 0., 255.)

        got = np.asarray(run(grays))  # (3, 2)
        assert got.shape == (3, 2)

        for t in range(3):
            ref = pipe.infer_from_gray(np.asarray(grays[t]))
            np.testing.assert_array_equal(got[t], np.asarray(ref["grades"]))

    def test_flush_tick_does_not_leak(self, pipe):
        """The drain tick's dummy microbatch must not contribute grades."""
        mesh = make_stage_mesh()
        run = make_pp_pipeline(pipe, mesh)
        grays = jax.random.uniform(jax.random.PRNGKey(7), (1, 2, 80, 100),
                                   jnp.float32, 0., 255.)
        got = np.asarray(run(grays))
        assert got.shape == (1, 2)
        ref = pipe.infer_from_gray(np.asarray(grays[0]))
        np.testing.assert_array_equal(got[0], np.asarray(ref["grades"]))

    def test_grade_parity_fused_up1(self, pipe):
        """pp's stage0 keeps the fused Pallas up1 tail (per-device programs
        under shard_map, same argument as the dp runner): grades must match
        the single-device fused pipeline exactly."""
        from unet_goolenet_tpu.ops.pallas import up1 as PU

        unet = UNetTaskAligWeight(n_classes=1)
        gnet = GoogLeNetClassifier(num_classes=6)
        uv = unet.init({"params": KEY}, jnp.zeros((1, SIZE, SIZE, 3)),
                       train=False)
        gv = gnet.init({"params": KEY, "dropout": KEY},
                       jnp.zeros((1, SIZE, SIZE, 3)), train=False)
        grays = jax.random.uniform(KEY, (2, 2, 80, 100), jnp.float32, 0., 255.)

        old = PU._INTERPRET
        PU._INTERPRET = True
        try:
            fused = TwoStagePipeline(unet, uv, gnet, gv, img_size=SIZE,
                                     fused_up1=True)
            run = make_pp_pipeline(fused, make_stage_mesh())
            got = np.asarray(run(grays))
            for t in range(2):
                ref = fused.infer_from_gray(np.asarray(grays[t]))
                np.testing.assert_array_equal(got[t],
                                              np.asarray(ref["grades"]))
        finally:
            PU._INTERPRET = old
