"""End-to-end CLI integration: the four entry points chained on a tiny synthetic
BUSI-style dataset, exactly as a user would run them (SURVEY.md §1 entry points)."""

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
