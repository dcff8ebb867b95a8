"""Deployment-export roundtrips (pipeline/export.py): the serving graph
serialized to StableHLO + weights must reproduce the live pipeline's grades
from a fresh load, at batch sizes never seen at export (batch-polymorphic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_goolenet_tpu.models import GoogLeNetClassifier, UNetTaskAligWeight
from unet_goolenet_tpu.pipeline import TwoStagePipeline
from unet_goolenet_tpu.pipeline.export import (
    export_serving,
    load_serving,
)

S = 32
RAW = (40, 48)
RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def pipe():
    key = jax.random.PRNGKey(0)
    unet = UNetTaskAligWeight(n_classes=1)
    gnet = GoogLeNetClassifier(num_classes=6)
    uv = unet.init({"params": key}, jnp.zeros((1, S, S, 3)), train=False)
    gv = gnet.init({"params": key, "dropout": key},
                   jnp.zeros((1, S, S, 3)), train=False)
    return TwoStagePipeline(unet, uv, gnet, gv, img_size=S)


def test_gray_roundtrip_batch_polymorphic(pipe, tmp_path):
    meta = export_serving(pipe, str(tmp_path), raw_hw=RAW)
    assert meta["source"] == "gray" and meta["raw_hw"] == list(RAW)
    # cross-platform lowering: the default artifact is built for BOTH cpu and
    # tpu, so a CPU build box produces the artifact the TPU serving box loads
    assert sorted(meta["platforms"]) == ["cpu", "tpu"]

    runner = load_serving(str(tmp_path))
    assert runner.meta["img_size"] == S
    for n in (2, 5):  # sizes never seen at export
        gray = RNG.uniform(0, 255, (n, *RAW)).astype(np.float32)
        want = pipe.infer_grades(jnp.asarray(gray))
        got = runner(gray)
        assert got.shape == (n,)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rgb_roundtrip(pipe, tmp_path):
    export_serving(pipe, str(tmp_path), source="rgb")
    runner = load_serving(str(tmp_path))
    imgs = RNG.uniform(0, 1, (3, S, S, 3)).astype(np.float32)
    want = pipe.infer_from_rgb(jnp.asarray(imgs))["grades"]
    np.testing.assert_array_equal(np.asarray(runner(imgs)), np.asarray(want))


def test_export_refuses_fused_pipeline(pipe, tmp_path):
    fused_pipe = TwoStagePipeline(pipe.unet, pipe.unet_vars, pipe.gnet,
                                  pipe.gnet_vars, img_size=S, fused_up1=True)
    with pytest.raises(ValueError, match="fused_up1"):
        export_serving(fused_pipe, str(tmp_path), raw_hw=RAW)


def test_gray_requires_raw_hw(pipe, tmp_path):
    with pytest.raises(ValueError, match="raw_hw"):
        export_serving(pipe, str(tmp_path))


def test_bf16_pipeline_export_roundtrip(tmp_path):
    """--bf16 export: bf16 compute inside the graph, f32 in / int grades out."""
    key = jax.random.PRNGKey(1)
    unet = UNetTaskAligWeight(n_classes=1, dtype=jnp.bfloat16)
    gnet = GoogLeNetClassifier(num_classes=6, dtype=jnp.bfloat16)
    uv = unet.init({"params": key}, jnp.zeros((1, S, S, 3)), train=False)
    gv = gnet.init({"params": key, "dropout": key},
                   jnp.zeros((1, S, S, 3)), train=False)
    bpipe = TwoStagePipeline(unet, uv, gnet, gv, img_size=S,
                             dtype=jnp.bfloat16)
    meta = export_serving(bpipe, str(tmp_path), raw_hw=RAW)
    assert meta["dtype"] == "bfloat16"
    runner = load_serving(str(tmp_path))
    gray = RNG.uniform(0, 255, (2, *RAW)).astype(np.float32)
    want = bpipe.infer_grades(jnp.asarray(gray))
    np.testing.assert_array_equal(np.asarray(runner(gray)), np.asarray(want))


@pytest.mark.parametrize("crossover", [128, 1])
def test_export_with_batch_policy(pipe, tmp_path, crossover):
    """The batch-aware layout policy must export under a SYMBOLIC batch dim:
    `b >= 128` is inconclusive under shape polymorphism (crashed on chip,
    queue 7) — polymorphic exports ship the packed graph; dense_batch_min=1
    forces the dense one (that comparison is conclusive for every b)."""
    ppipe = TwoStagePipeline(pipe.unet, pipe.unet_vars, pipe.gnet,
                             pipe.gnet_vars, img_size=S,
                             dense_batch_min=crossover)
    export_serving(ppipe, str(tmp_path), raw_hw=RAW)
    runner = load_serving(str(tmp_path))
    gray = RNG.uniform(0, 255, (3, *RAW)).astype(np.float32)
    want = ppipe.infer_grades(jnp.asarray(gray))
    np.testing.assert_array_equal(np.asarray(runner(gray)), np.asarray(want))


def test_static_batch_export_pads_and_chunks(pipe, tmp_path):
    """static_batch exports fix N; the loaded runner serves any N by
    zero-padding the last chunk and slicing the grades back (the fixed-shape
    production pattern — pipeline/export.py static_batch docs)."""
    meta = export_serving(pipe, str(tmp_path), raw_hw=RAW, static_batch=4)
    assert meta["static_batch"] == 4
    runner = load_serving(str(tmp_path))
    for n in (4, 2, 9):  # exact, padded, chunked (4+4+pad)
        gray = RNG.uniform(0, 255, (n, *RAW)).astype(np.float32)
        want = pipe.infer_grades(jnp.asarray(gray))
        got = runner(gray)
        assert got.shape == (n,)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_static_batch_export_ships_dense_branch(pipe, tmp_path):
    """A static batch makes the dense/packed crossover comparison conclusive,
    so static_batch >= dense_batch_min exports the DENSE graph — and must
    therefore refuse a dense_fused_up1 pipeline without keep_fused (the
    Pallas custom call reaches the artifact), where the polymorphic export
    of the same pipeline ships the packed graph and needs no opt-in."""
    hpipe = TwoStagePipeline(pipe.unet, pipe.unet_vars, pipe.gnet,
                             pipe.gnet_vars, img_size=S,
                             dense_batch_min=4, dense_fused_up1=True)
    with pytest.raises(ValueError, match="dense_fused_up1"):
        export_serving(hpipe, str(tmp_path), raw_hw=RAW, static_batch=4)
    # below the crossover the packed graph is exported: no Pallas, no opt-in
    meta = export_serving(hpipe, str(tmp_path), raw_hw=RAW, static_batch=2)
    assert meta["fused_levels"] == [] and meta["static_batch"] == 2
    runner = load_serving(str(tmp_path))
    gray = RNG.uniform(0, 255, (2, *RAW)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(runner(gray)),
        np.asarray(hpipe.infer_grades(jnp.asarray(gray))))


def test_single_platform_export(pipe, tmp_path):
    meta = export_serving(pipe, str(tmp_path), source="rgb",
                          platforms=("cpu",))
    assert meta["platforms"] == ["cpu"]
    runner = load_serving(str(tmp_path))
    imgs = RNG.uniform(0, 1, (2, S, S, 3)).astype(np.float32)
    want = pipe.infer_from_rgb(jnp.asarray(imgs))["grades"]
    np.testing.assert_array_equal(np.asarray(runner(imgs)), np.asarray(want))
