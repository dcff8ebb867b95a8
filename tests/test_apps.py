"""End-to-end CLI integration: the four entry points chained on a tiny synthetic
BUSI-style dataset, exactly as a user would run them (SURVEY.md §1 entry points)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

RNG = np.random.default_rng(11)
S = 32  # tiny image size keeps CPU compiles fast


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("busi_e2e")
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        for i in range(4):
            grade = (i % 6) + 1
            name = f"{grade}_{split}{i}.png"
            img = (RNG.random((40, 48, 3)) * 255).astype(np.uint8)
            mask = np.zeros((40, 48), np.uint8)
            mask[10:28, 12:36] = 255
            Image.fromarray(img).save(root / split / "images" / name)
            Image.fromarray(mask).save(root / split / "labels" / name)
    for split in ("ctrain", "cval"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        lines = []
        for i in range(4):
            g = (RNG.random((40, 48)) * 255).astype(np.uint8)
            Image.fromarray(g).save(root / split / "images" / f"{i}.png")
            lines.append(f"{i}.png {i % 6}")
        (root / split / "labels" / "label.txt").write_text("\n".join(lines))
    (root / "test").mkdir()
    for i in range(3):
        g = (RNG.random((40, 48)) * 255).astype(np.uint8)
        Image.fromarray(g).save(root / "test" / f"{i}.png")
    return root


def test_full_cli_chain(data_root, tmp_path):
    from unet_goolenet_tpu.apps import train_seg, predict_seg, train_cls, infer_e2e

    seg_dir = str(tmp_path / "seg")
    train_seg.main([
        "--train-dir", str(data_root / "train"), "--val-dir", str(data_root / "val"),
        "--epochs", "1", "--batch-size", "2", "--img-size", str(S),
        "--save-dir", seg_dir,
    ])
    seg_ckpts = os.listdir(seg_dir)
    assert any(c.startswith("best_model") for c in seg_ckpts), seg_ckpts
    seg_ckpt = os.path.join(seg_dir, [c for c in seg_ckpts if c.startswith("best_model")][0])

    out_seg = str(tmp_path / "pred")
    predict_seg.main([
        "--image-dir", str(data_root / "test"), "--checkpoint", seg_ckpt,
        "--out-dir", out_seg, "--img-size", str(S), "--batch-size", "2",
    ])
    masks = os.listdir(os.path.join(out_seg, "Segmentation_Results"))
    assert len(masks) == 3
    png = np.asarray(Image.open(os.path.join(out_seg, "Segmentation_Results", masks[0])))
    assert png.shape == (S, S, 3)
    assert set(np.unique(png[..., 1])) == {0}  # red-on-black: G channel empty

    cls_dir = str(tmp_path / "cls")
    train_cls.main([
        "--train-dir", str(data_root / "ctrain"), "--val-dir", str(data_root / "cval"),
        "--unet-checkpoint", seg_ckpt, "--epochs", "1", "--batch-size", "2",
        "--img-size", str(S), "--save-dir", cls_dir, "--crop-augment", "device",
    ])
    cls_ckpts = os.listdir(cls_dir)
    assert any(c.startswith("best_model") for c in cls_ckpts), cls_ckpts
    cls_ckpt = os.path.join(cls_dir, [c for c in cls_ckpts if c.startswith("best_model")][0])

    out_e2e = str(tmp_path / "e2e")
    infer_e2e.main([
        "--image-dir", str(data_root / "test"), "--unet-checkpoint", seg_ckpt,
        "--gnet-checkpoint", cls_ckpt, "--out-dir", out_e2e,
        "--img-size", str(S), "--batch-size", "2",
    ])
    lines = open(os.path.join(out_e2e, "result.txt")).read().strip().splitlines()
    assert len(lines) == 3
    # "name grade" with numeric sort and grades in range (test.py:90-96 format)
    names = [int(l.split()[0]) for l in lines]
    grades = [int(l.split()[1]) for l in lines]
    assert names == sorted(names)
    assert all(0 <= g < 6 for g in grades)

    # the north-star fused-from-gray path (--device-preprocess) must grade the
    # same inputs identically to the host-preprocess path above
    out_dev = str(tmp_path / "e2e_dev")
    infer_e2e.main([
        "--image-dir", str(data_root / "test"), "--unet-checkpoint", seg_ckpt,
        "--gnet-checkpoint", cls_ckpt, "--out-dir", out_dev,
        "--img-size", str(S), "--batch-size", "2", "--device-preprocess",
    ])
    dev_lines = open(os.path.join(out_dev, "result.txt")).read().strip().splitlines()
    assert dev_lines == lines

    # deployment export off the same checkpoints: --static-batch fixes N in
    # the graph, --check asserts artifact-vs-live grade parity on reload
    from unet_goolenet_tpu.apps import export_serving as export_app

    art = str(tmp_path / "artifact")
    export_app.main([
        "--unet-checkpoint", seg_ckpt, "--gnet-checkpoint", cls_ckpt,
        "--raw-hw", "40", "48", "--out-dir", art, "--img-size", str(S),
        "--static-batch", "2", "--platforms", "cpu", "--check",
    ])
    meta = json.load(open(os.path.join(art, "meta.json")))
    assert meta["static_batch"] == 2 and meta["fused_levels"] == []


def test_main_dispatcher(capsys):
    """`python -m unet_goolenet_tpu <command>` routes to the app CLIs (the
    packaged replacement for the reference's four loose scripts)."""
    from unet_goolenet_tpu.__main__ import main

    with pytest.raises(SystemExit) as e:
        main([])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    for cmd in ("train-seg", "predict-seg", "train-cls", "infer-e2e",
                "serve", "export"):
        assert cmd in out
    with pytest.raises(SystemExit) as e:
        main(["not-a-command"])
    assert e.value.code == 2
    # delegation reaches the app's argparse (its --help exits 0)
    with pytest.raises(SystemExit) as e:
        main(["train-seg", "--help"])
    assert e.value.code == 0
    assert "--multihost" in capsys.readouterr().out


def test_size_buckets_cli(tmp_path, capsys):
    """--size-buckets bounds full-pipeline compiles on a mixed-resolution
    archive and grades identically to the exact-shape --device-preprocess path
    (VERDICT r2 #4: 分类/test.py:122-134 over heterogeneous raw sizes)."""
    import jax
    from unet_goolenet_tpu.apps import infer_e2e
    from unet_goolenet_tpu.apps.infer_e2e import COMPILE_GUARD, bucket_shapes
    from unet_goolenet_tpu.models import UNetTaskAligWeight, GoogLeNetClassifier
    from unet_goolenet_tpu.train import optim
    from unet_goolenet_tpu.train.checkpoint import CheckpointManager
    from unet_goolenet_tpu.train.cls import init_cls_state
    from unet_goolenet_tpu.train.seg import init_seg_state

    # bucket_shapes: every shape fits its (even-sized) bucket, count bounded
    sizes = [(40 + 3 * i, 48 + 2 * i) for i in range(10)]
    mapping = bucket_shapes(sizes, 3)
    assert len(set(mapping.values())) <= 3
    for (h, w), (bh, bw) in mapping.items():
        assert bh >= h and bw >= w and bh % 2 == 0 and bw % 2 == 0

    img_dir = tmp_path / "mixed"
    img_dir.mkdir()
    for i, (h, w) in enumerate(sizes):
        g = (RNG.random((h, w)) * 255).astype(np.uint8)
        Image.fromarray(g).save(img_dir / f"{i}.png")

    unet = UNetTaskAligWeight(n_classes=1)
    seg_state = init_seg_state(unet, optim.make_adamw(), jax.random.PRNGKey(0),
                               input_shape=(1, S, S, 3))
    seg_ckpt = CheckpointManager(str(tmp_path / "seg")).save_best_loss(seg_state, 0)
    gnet = GoogLeNetClassifier(num_classes=6)
    cls_state = init_cls_state(gnet, optim.make_adamw(), jax.random.PRNGKey(1),
                               input_shape=(1, S, S, 3))
    cls_ckpt = CheckpointManager(str(tmp_path / "cls")).save_best_loss(cls_state, 0)

    def run(tag, extra):
        out = str(tmp_path / f"out_{tag}")
        infer_e2e.main([
            "--image-dir", str(img_dir), "--unet-checkpoint", seg_ckpt,
            "--gnet-checkpoint", cls_ckpt, "--out-dir", out,
            "--img-size", str(S), "--batch-size", "2", "--device-preprocess",
        ] + extra)
        return open(os.path.join(out, "result.txt")).read()

    exact = run("exact", [])  # 10 distinct sizes > COMPILE_GUARD -> warns
    assert f"--size-buckets {COMPILE_GUARD}" in capsys.readouterr().out
    bucketed = run("buckets", ["--size-buckets", "3"])
    assert bucketed == exact


@pytest.fixture(scope="module")
def dp_data_root(tmp_path_factory):
    """8-item splits so one full batch divides the 8-device mesh."""
    # own generator (not the module RNG): the data must not depend on which
    # other fixtures ran first, or this test changes between -k runs and the
    # full suite
    RNG = np.random.default_rng(1234)
    root = tmp_path_factory.mktemp("busi_dp")
    for split in ("ctrain", "cval"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        lines = []
        for i in range(8):
            g = (RNG.random((40, 48)) * 255).astype(np.uint8)
            Image.fromarray(g).save(root / split / "images" / f"{i}.png")
            lines.append(f"{i}.png {i % 6}")
        (root / split / "labels" / "label.txt").write_text("\n".join(lines))
    (root / "test").mkdir()
    for i in range(3):
        g = (RNG.random((40, 48)) * 255).astype(np.uint8)
        Image.fromarray(g).save(root / "test" / f"{i}.png")
    return root


def test_data_parallel_clis(dp_data_root, tmp_path):
    """BASELINE config 5 from shipped CLIs: train_cls --data-parallel and
    infer_e2e --data-parallel on the 8-device virtual mesh must match the
    single-device runs (loss within float tolerance, grades exactly)."""
    import json

    import jax
    from unet_goolenet_tpu.apps import train_cls, infer_e2e

    assert len(jax.devices()) == 8  # conftest's virtual mesh

    # a tiny stage-1 checkpoint to freeze (random-init weights are fine: the
    # parity under test is dp-vs-single-device, not model quality)
    from unet_goolenet_tpu.models import UNetTaskAligWeight
    from unet_goolenet_tpu.train import optim
    from unet_goolenet_tpu.train.checkpoint import CheckpointManager
    from unet_goolenet_tpu.train.seg import init_seg_state

    unet = UNetTaskAligWeight(n_classes=1)
    seg_state = init_seg_state(unet, optim.make_adamw(), jax.random.PRNGKey(0),
                               input_shape=(1, S, S, 3))
    seg_ckpt = CheckpointManager(str(tmp_path / "seg")).save_best_loss(seg_state, 0)

    def run_train(tag, extra):
        log_dir = str(tmp_path / f"log_{tag}")
        train_cls.main([
            "--train-dir", str(dp_data_root / "ctrain"),
            "--val-dir", str(dp_data_root / "cval"),
            "--unet-checkpoint", seg_ckpt, "--epochs", "1", "--batch-size", "8",
            "--img-size", str(S), "--save-dir", str(tmp_path / f"cls_{tag}"),
            "--crop-augment", "none", "--log-dir", log_dir,
        ] + extra)
        log_file = [f for f in os.listdir(log_dir) if f.endswith(".jsonl")][0]
        rec = json.loads(open(os.path.join(log_dir, log_file)).readline())
        ckpts = os.listdir(tmp_path / f"cls_{tag}")
        ckpt = os.path.join(str(tmp_path / f"cls_{tag}"),
                            [c for c in ckpts if c.startswith("best_model")][0])
        return rec, ckpt

    ref, ref_ckpt = run_train("single", [])
    dp, dp_ckpt = run_train("dp", ["--data-parallel"])
    # Tolerance note: the STEP is exactly dp==single (test_tp asserts it on
    # fixed crops), but the CLI chains the frozen-UNet sigmoid>0.5 mask
    # threshold: batch-8 convs vs 8x batch-1 GSPMD shards round differently
    # in the last f32 bit, a near-0.5 pixel (common with random-init weights)
    # flips, the bbox shifts a pixel and the crop change moves the loss at
    # the ~1e-3 scale. 5e-3 accommodates that discrete sensitivity.
    assert abs(dp["train_loss"] - ref["train_loss"]) < 5e-3, (dp, ref)
    assert abs(dp["val_loss"] - ref["val_loss"]) < 5e-3, (dp, ref)

    # sharded serving: grades must match the single-device pipeline exactly,
    # on both ingest paths (host-preprocess and fused-from-gray)
    def run_infer(tag, extra):
        out = str(tmp_path / f"e2e_{tag}")
        infer_e2e.main([
            "--image-dir", str(dp_data_root / "test"),
            "--unet-checkpoint", seg_ckpt, "--gnet-checkpoint", ref_ckpt,
            "--out-dir", out, "--img-size", str(S), "--batch-size", "8",
        ] + extra)
        return open(os.path.join(out, "result.txt")).read()

    single = run_infer("single", [])
    assert run_infer("dp", ["--data-parallel"]) == single
    assert run_infer("dp_dev", ["--data-parallel", "--device-preprocess"]) == \
        run_infer("dev", ["--device-preprocess"])


def test_engine_roi_extractor_matches_flax():
    """--engine-roi routes the frozen-UNet ROI extraction through the packed
    engine forward; crops and logits must match the flax-apply path (same
    numerics up to f32 summation order — tests/test_engine.py asserts the
    forward itself; this locks the extractor plumbing)."""
    import jax
    import jax.numpy as jnp

    from unet_goolenet_tpu.apps.train_cls import make_roi_extractor
    from unet_goolenet_tpu.models import UNetTaskAligWeight
    from unet_goolenet_tpu.train import optim
    from unet_goolenet_tpu.train.seg import init_seg_state

    unet = UNetTaskAligWeight(n_classes=1)
    seg_state = init_seg_state(unet, optim.make_adamw(), jax.random.PRNGKey(3),
                               input_shape=(1, S, S, 3))
    unet_vars = {"params": seg_state.params,
                 "batch_stats": seg_state.batch_stats}
    imgs = jnp.asarray(RNG.random((2, S, S, 3)), jnp.float32)

    dense = make_roi_extractor(unet, unet_vars, S, engine=False)
    packed = make_roi_extractor(unet, unet_vars, S, engine=True)
    crops_d, logits_d = dense(imgs)
    crops_p, logits_p = packed(imgs)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_d),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(crops_p), np.asarray(crops_d),
                               atol=1e-4)


def test_flag_guards_fail_fast():
    """Flag combinations that would silently change what runs must error at
    parse time, before any model/checkpoint work (the train_seg
    --engine-forward/--data-parallel contract applied everywhere)."""
    from unet_goolenet_tpu.apps import train_cls, train_seg, infer_e2e

    with pytest.raises(SystemExit, match="divisible by the device count"):
        train_seg.main(["--train-dir", "x", "--val-dir", "x",
                        "--data-parallel", "--batch-size", "3"])
    with pytest.raises(SystemExit, match="remat requires --engine-forward"):
        # checked before the single-device branch: --data-parallel would
        # otherwise build its sharded step without remat (ADVICE r4)
        train_seg.main(["--train-dir", "x", "--val-dir", "x",
                        "--data-parallel", "--batch-size", "8",
                        "--remat", "levels"])
    with pytest.raises(SystemExit, match="even --img-size"):
        train_cls.main(["--train-dir", "x", "--val-dir", "x",
                        "--unet-checkpoint", "x",
                        "--engine-roi", "on", "--img-size", "33"])
    with pytest.raises(SystemExit, match="device-preprocess"):
        infer_e2e.main(["--image-dir", "x", "--unet-checkpoint", "x",
                        "--gnet-checkpoint", "x", "--size-buckets", "4"])
