"""Learning-curve smoke tests: the REAL training loops must actually learn.

VERDICT r1 gap: every prior training test asserted steps run / loss finite /
sequences match — a sign error in the refinement feedback (分割/main.py:159-176),
the plateau wiring (main.py:261), or the loss would still pass. Here the full
`train_seg` / `train_cls` CLI loops run on synthetic data where the right answer
is unambiguous, and we assert the learning curve itself:

  * seg: bright ellipse blobs on dark noise -> val dice must exceed 0.8 and the
    train loss must fall (分割/main.py:149-189, 256-300 semantics);
  * cls: brightness-banded 6-class grays -> val accuracy must clearly beat the
    1/6 chance floor (分类/ROI_main.py:165-241 semantics).

Fixed seeds + CPU jit make the curves deterministic, so the thresholds are
stable, not flaky.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

S = 32


def _ellipse_mask(h, w, cy, cx, ry, rx):
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) <= 1.0


def _make_seg_data(root, n_train=16, n_val=8, seed=0):
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        for i in range(n):
            h, w = 40, 48
            cy, cx = rng.integers(12, h - 12), rng.integers(14, w - 14)
            ry, rx = rng.integers(6, 11), rng.integers(7, 12)
            blob = _ellipse_mask(h, w, cy, cx, ry, rx)
            img = rng.integers(0, 80, (h, w, 3)).astype(np.uint8)
            img[blob] = rng.integers(180, 250)
            name = f"{(i % 6) + 1}_case{i}.png"
            Image.fromarray(img).save(root / split / "images" / name)
            Image.fromarray((blob * 255).astype(np.uint8)).save(
                root / split / "labels" / name)


def _make_cls_data(root, n_train=18, n_val=12, seed=1):
    """Class k = vertical grating of a class-specific spatial period. The signal
    survives wavelet_enhance's per-image min-max normalisation (which erases
    absolute brightness) and any crop window (the grating tiles the image)."""
    rng = np.random.default_rng(seed)
    periods = [4, 6, 8, 12, 20, 32]
    for split, n in (("train", n_train), ("val", n_val)):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        lines = []
        for i in range(n):
            label = i % 6
            xs = np.arange(48)[None, :] + rng.integers(0, 8)  # random phase
            grating = 128 + 80 * np.sin(2 * np.pi * xs / periods[label])
            g = np.clip(grating + rng.normal(0, 10, (40, 48)), 0, 255
                        ).astype(np.uint8)
            Image.fromarray(g).save(root / split / "images" / f"{i}.png")
            lines.append(f"{i}.png {label}")
        (root / split / "labels" / "label.txt").write_text("\n".join(lines))


def _read_jsonl(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def test_seg_loop_learns(tmp_path):
    from unet_goolenet_tpu.apps import train_seg

    _make_seg_data(tmp_path)
    log_dir = str(tmp_path / "logs")
    train_seg.main([
        "--train-dir", str(tmp_path / "train"), "--val-dir", str(tmp_path / "val"),
        "--epochs", "20", "--batch-size", "4", "--img-size", str(S),
        "--lr", "3e-4", "--save-dir", str(tmp_path / "ckpt"),
        "--log-dir", log_dir,
    ])
    rows = _read_jsonl(os.path.join(log_dir, "train_seg.jsonl"))
    dices = [r["dice"] for r in rows if "dice" in r]
    losses = [r["train_loss"] for r in rows]
    assert max(dices) > 0.8, f"never learned: max dice {max(dices):.3f}"
    # the tail of the curve must be genuinely better than the start
    assert min(losses[-3:]) < 0.5 * losses[0], losses
    # plateau scheduler state is live: lr is logged and never above base
    assert all(r["lr"] <= 3e-4 + 1e-9 for r in rows)


def test_cls_loop_learns(tmp_path):
    from unet_goolenet_tpu.apps import train_seg, train_cls

    # a 1-epoch UNet provides the frozen stage-1 checkpoint train_cls needs
    # (its masks will be poor -> the ROI centre-fallback path carries the crop)
    _make_seg_data(tmp_path, n_train=4, n_val=4)
    seg_dir = str(tmp_path / "seg_ckpt")
    train_seg.main([
        "--train-dir", str(tmp_path / "train"), "--val-dir", str(tmp_path / "val"),
        "--epochs", "1", "--batch-size", "4", "--img-size", str(S),
        "--save-dir", seg_dir,
    ])
    ckpt = [c for c in os.listdir(seg_dir) if c.startswith("best_model")][0]

    croot = tmp_path / "cls_data"
    _make_cls_data(croot)
    log_dir = str(tmp_path / "cls_logs")
    train_cls.main([
        "--train-dir", str(croot / "train"), "--val-dir", str(croot / "val"),
        "--unet-checkpoint", os.path.join(seg_dir, ckpt),
        "--epochs", "25", "--batch-size", "6", "--img-size", str(S),
        "--lr", "3e-4", "--save-dir", str(tmp_path / "cls_ckpt"),
        "--log-dir", log_dir, "--crop-augment", "device",
    ])
    rows = _read_jsonl(os.path.join(log_dir, "train_cls.jsonl"))
    accs = [r["acc"] for r in rows if "acc" in r]
    assert max(accs) >= 0.5, f"no better than chance: max acc {max(accs):.3f}"
