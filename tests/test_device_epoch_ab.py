"""A/B evidence for --device-epoch (VERDICT r1 weak #6 / next-step #9).

--device-epoch augments the RESIZED images on device, while the host path
augments RAW-size images and then resizes (分割/util/data_utils.py:166-221).
These are admitted to be "semantically close, not identical"; this file
quantifies the claim two ways:

  1. distribution: identical synthetic inputs through both augmentation paths;
     the per-image intensity and mask-area distributions must agree closely in
     the mean (randomness differs per path, so we compare moments, not pixels);
  2. outcome: the real train_seg loop, same data and seed, N epochs per arm;
     both arms must learn (dice > 0.55) and land within noise of each other.

Measured deltas are recorded in PARITY.md ("--device-epoch" entry).
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_learning import _make_seg_data, _read_jsonl

S = 32


def test_augment_distribution_close(tmp_path):
    from unet_goolenet_tpu.data.augment import AugmentConfig
    from unet_goolenet_tpu.data.augment_device import make_device_augment
    from unet_goolenet_tpu.data.datasets import SegDataset

    _make_seg_data(tmp_path, n_train=16, n_val=1, seed=3)

    # host path: raw-size augment -> resize (inside SegDataset)
    rng = np.random.default_rng(0)
    host_ds = SegDataset(str(tmp_path / "train"), img_size=S, train=True, rng=rng)
    host_imgs, host_masks = [], []
    for _ in range(8):  # 8 epochs of host augmentation draws
        for i in range(len(host_ds)):
            item = host_ds[i]
            host_imgs.append(item["image"])
            host_masks.append(item["se_label"][..., 0])
    host_imgs = np.stack(host_imgs)
    host_masks = np.stack(host_masks)

    # device path: resize (eval) once -> batched device augment
    eval_ds = SegDataset(str(tmp_path / "train"), img_size=S, train=False)
    base_imgs = jnp.asarray(np.stack([eval_ds[i]["image"] for i in range(len(eval_ds))]))
    base_masks = jnp.asarray(np.stack(
        [eval_ds[i]["se_label"][..., 0] for i in range(len(eval_ds))]).astype(np.int32))
    augment = make_device_augment(AugmentConfig.seg_train(S), with_mask=True)
    dev_imgs, dev_masks = [], []
    key = jax.random.PRNGKey(0)
    for _ in range(8):
        key, sub = jax.random.split(key)
        ai, am = augment(sub, base_imgs, base_masks)
        dev_imgs.append(np.asarray(ai))
        dev_masks.append(np.asarray(am))
    dev_imgs = np.concatenate(dev_imgs)
    dev_masks = np.concatenate(dev_masks)

    h_mean, d_mean = host_imgs.mean(), dev_imgs.mean()
    h_std, d_std = host_imgs.std(), dev_imgs.std()
    h_area, d_area = host_masks.mean(), dev_masks.mean()
    print(f"intensity mean host={h_mean:.4f} dev={d_mean:.4f}; "
          f"std host={h_std:.4f} dev={d_std:.4f}; "
          f"mask area host={h_area:.4f} dev={d_area:.4f}")
    assert abs(h_mean - d_mean) < 0.1 * max(h_mean, d_mean), (h_mean, d_mean)
    assert abs(h_std - d_std) < 0.15 * max(h_std, d_std), (h_std, d_std)
    assert abs(h_area - d_area) < 0.2 * max(h_area, d_area), (h_area, d_area)


def test_training_outcome_within_noise(tmp_path):
    from unet_goolenet_tpu.apps import train_seg

    _make_seg_data(tmp_path, n_train=12, n_val=8, seed=4)
    best = {}
    for arm, extra in (("host", []), ("device", ["--device-epoch"])):
        log_dir = str(tmp_path / f"logs_{arm}")
        train_seg.main([
            "--train-dir", str(tmp_path / "train"),
            "--val-dir", str(tmp_path / "val"),
            "--epochs", "10", "--batch-size", "4", "--img-size", str(S),
            "--lr", "3e-4", "--save-dir", str(tmp_path / f"ckpt_{arm}"),
            "--log-dir", log_dir, *extra,
        ])
        rows = _read_jsonl(os.path.join(log_dir, "train_seg.jsonl"))
        best[arm] = max(r["dice"] for r in rows if "dice" in r)
    print(f"A/B best dice: host={best['host']:.3f} device={best['device']:.3f}")
    assert best["host"] > 0.55, best
    assert best["device"] > 0.55, best
    assert abs(best["host"] - best["device"]) < 0.25, best
