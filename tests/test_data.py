"""Data-layer tests: augmentation semantics, dataset conventions, loader."""

import os

import numpy as np
import pytest
from PIL import Image

from unet_goolenet_tpu.data import (
    AugmentConfig,
    Augmenter,
    SegDataset,
    ClsDataset,
    ImageFolderDataset,
    DataLoader,
)

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def busi_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("busi")
    for split in ("train",):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        for i in range(4):
            grade = (i % 6) + 1
            name = f"{grade}_img{i}.png"
            img = (RNG.random((50, 60, 3)) * 255).astype(np.uint8)
            mask = np.zeros((50, 60), np.uint8)
            mask[10:30, 15:45] = 255
            Image.fromarray(img).save(root / split / "images" / name)
            Image.fromarray(mask).save(root / split / "labels" / name)
    (root / "cls" / "images").mkdir(parents=True)
    (root / "cls" / "labels").mkdir(parents=True)
    lines = []
    for i in range(4):
        name = f"{i}.png"
        g = (RNG.random((50, 60)) * 255).astype(np.uint8)
        Image.fromarray(g).save(root / "cls" / "images" / name)
        lines.append(f"{name} {i % 6}")
    (root / "cls" / "labels" / "label.txt").write_text("\n".join(lines))
    return str(root)


class TestAugmenter:
    def test_eval_is_resize_only(self):
        cfg = AugmentConfig.eval(32)
        aug = Augmenter(cfg, np.random.default_rng(0))
        img = (RNG.random((64, 64, 3)) * 255).astype(np.uint8)
        mask = (RNG.random((64, 64)) > 0.5).astype(np.uint8)
        out_img, out_msk = aug(img, mask)
        assert out_img.shape == (32, 32, 3) and out_img.dtype == np.float32
        assert out_msk.shape == (32, 32) and out_msk.dtype == np.int32
        # deterministic: eval config has no stochastic branch
        out2, _ = aug(img, mask)
        np.testing.assert_array_equal(out_img, out2)

    def test_mask_stays_binary_under_geometric_ops(self):
        cfg = AugmentConfig.seg_train(32)
        aug = Augmenter(cfg, np.random.default_rng(3))
        img = (RNG.random((48, 48, 3)) * 255).astype(np.uint8)
        mask = np.zeros((48, 48), np.uint8)
        mask[10:30, 10:30] = 1
        for _ in range(10):
            _, m = aug(img, mask)
            assert set(np.unique(m)) <= {0, 1}

    def test_flip_applied_jointly(self):
        cfg = AugmentConfig(img_size=16, ori_size=16, p_hflip=1.0)
        aug = Augmenter(cfg, np.random.default_rng(0))
        img = np.zeros((16, 16, 3), np.uint8)
        img[:, :8] = 255
        mask = np.zeros((16, 16), np.uint8)
        mask[:, :8] = 1
        out_img, out_msk = aug(img, mask)
        # left-bright becomes right-bright in both
        assert out_img[:, 12:].mean() > out_img[:, :4].mean()
        assert out_msk[:, 12:].mean() > out_msk[:, :4].mean()

    def test_grayscale_input_broadcasts(self):
        aug = Augmenter(AugmentConfig.eval(16))
        out, _ = aug((RNG.random((20, 20)) * 255).astype(np.uint8), None)
        assert out.shape == (16, 16, 3)


class TestDatasets:
    def test_seg_dataset_conventions(self, busi_root):
        ds = SegDataset(os.path.join(busi_root, "train"), img_size=32)
        item = ds[0]
        assert item["image"].shape == (32, 32, 3)
        assert item["se_label"].shape == (32, 32, 1)
        assert set(np.unique(item["se_label"])) <= {0.0, 1.0}  # //255 applied
        # filename-encoded grade minus one
        assert item["cl_label"] == int(ds.names[0][0]) - 1

    def test_cls_dataset_label_txt(self, busi_root):
        ds = ClsDataset(os.path.join(busi_root, "cls"), img_size=32)
        item = ds[2]
        assert item["cl_label"] == 2 % 6
        assert item["image"].shape == (32, 32, 3)
        # wavelet pseudo-RGB: channels differ (not a gray triplicate)
        img = item["image"]
        assert np.abs(img[..., 0] - img[..., 2]).max() > 1e-3

    def test_image_folder_sorted(self, busi_root):
        ds = ImageFolderDataset(os.path.join(busi_root, "cls", "images"),
                                img_size=32, wavelet=True)
        assert ds.names == sorted(ds.names)
        assert ds[0]["image"].shape == (32, 32, 3)


class TestLoader:
    def test_batching_and_order(self, busi_root):
        ds = SegDataset(os.path.join(busi_root, "train"), img_size=32)
        loader = DataLoader(ds, batch_size=3, num_workers=2)
        batches = list(loader)
        assert [b["image"].shape[0] for b in batches] == [3, 1]
        # non-shuffled loader preserves dataset order
        assert batches[0]["name"][0] == ds.names[0]

    def test_shuffle_reproducible_per_epoch(self, busi_root):
        ds = SegDataset(os.path.join(busi_root, "train"), img_size=32)
        l1 = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
        l2 = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
        n1 = [b["name"] for b in l1][0]
        n2 = [b["name"] for b in l2][0]
        assert n1 == n2
        # second epoch differs
        n1b = [b["name"] for b in l1][0]
        assert n1 != n1b

    def test_drop_last(self, busi_root):
        ds = SegDataset(os.path.join(busi_root, "train"), img_size=32)
        loader = DataLoader(ds, batch_size=3, drop_last=True)
        assert len(list(loader)) == 1

    def test_dataset_error_propagates(self):
        class Broken:
            def __len__(self):
                return 6

            def __getitem__(self, i):
                if i == 3:
                    raise IOError("corrupt image")
                return {"x": np.zeros(2, np.float32)}

        loader = DataLoader(Broken(), batch_size=2, num_workers=2)
        with pytest.raises(RuntimeError, match="worker failed"):
            list(loader)

    def test_prefetch_bounds_read_ahead(self):
        import itertools
        import threading
        import time

        fetched = itertools.count()
        count = [0]
        lock = threading.Lock()

        class Counting:
            def __len__(self):
                return 32

            def __getitem__(self, i):
                with lock:
                    count[0] += 1
                return {"x": np.zeros(2, np.float32)}

        loader = DataLoader(Counting(), batch_size=2, num_workers=2, prefetch=2)
        it = iter(loader)
        next(it)
        time.sleep(0.3)  # a stalled consumer must not let workers run away
        # consumed 1 batch + prefetch slots (2) + at most num_workers in flight
        assert count[0] <= (1 + 2 + 2) * 2, count[0]
        for _ in it:
            pass
        assert count[0] == 32


def test_resize_bilinear_np_matches_cv2():
    """The numpy INTER_LINEAR twin (datasets._resize_bilinear_np) that backs
    wavelet_enhance_host on cv2-less installs must match cv2 on the upscales
    the wavelet path performs (half-res coefficients -> full res)."""
    import cv2

    from unet_goolenet_tpu.data.datasets import _resize_bilinear_np

    rng = np.random.default_rng(21)
    for (h, w) in ((40, 48), (37, 51), (20, 20)):
        src = rng.random((max(1, h // 2), max(1, w // 2))).astype(np.float32) * 255
        ours = _resize_bilinear_np(src, (h, w))
        ref = cv2.resize(src, (w, h), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-3)


def test_wavelet_enhance_host_without_cv2(monkeypatch):
    """wavelet_enhance_host must work on a clean `pip install .` (cv2 is only
    the .[test] oracle extra) and agree with the cv2 path to uint8 rounding."""
    import builtins
    import sys

    from unet_goolenet_tpu.data.datasets import wavelet_enhance_host

    gray = (np.random.default_rng(5).random((41, 53)) * 255).astype(np.uint8)
    with_cv2 = wavelet_enhance_host(gray)

    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError("cv2 hidden for the fallback test")
        return real_import(name, *a, **k)

    monkeypatch.delitem(sys.modules, "cv2", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_cv2)
    without_cv2 = wavelet_enhance_host(gray)
    # uint8 quantisation after minmax-norm: allow off-by-one on boundary pixels
    assert np.abs(with_cv2.astype(int) - without_cv2.astype(int)).max() <= 1
