"""Stage-1 batch mask prediction CLI (reference: 分割/predict.py).

Writes the same artefacts: red-on-black mask PNGs under
`<out>/Segmentation_Results/<name>.png` and a `Classification_Results.xlsx`
workbook. The reference's per-pixel `Image.putpixel` loop (predict.py:40-43 — the
worst host hot loop in the codebase, SURVEY.md §3.5) is replaced by one vectorised
array write per image.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax.numpy as jnp
from PIL import Image

from unet_goolenet_tpu.data import ImageFolderDataset, DataLoader
from unet_goolenet_tpu.models import UNetTaskAligWeight
from unet_goolenet_tpu.train import optim
from unet_goolenet_tpu.train.checkpoint import CheckpointManager
from unet_goolenet_tpu.train.seg import init_seg_state, make_seg_eval_step
from unet_goolenet_tpu.utils import seed_everything

import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Predict segmentation masks")
    p.add_argument("--image-dir", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out-dir", default="test_results")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--img-size", type=int, default=224)
    return p.parse_args(argv)


def write_mask_png(mask: np.ndarray, path: str) -> None:
    """(H, W) {0,1} -> red-on-black RGB PNG, one vectorised write."""
    h, w = mask.shape
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[..., 0] = (mask > 0).astype(np.uint8) * 255
    Image.fromarray(rgb).save(path)


def main(argv=None):
    args = parse_args(argv)
    key = seed_everything()
    seg_dir = os.path.join(args.out_dir, "Segmentation_Results")
    os.makedirs(seg_dir, exist_ok=True)

    ds = ImageFolderDataset(args.image_dir, img_size=args.img_size, wavelet=False)
    loader = DataLoader(ds, args.batch_size)

    model = UNetTaskAligWeight(n_classes=1)
    tx = optim.make_adamw()
    state = init_seg_state(model, tx, key,
                           input_shape=(1, args.img_size, args.img_size, 3))
    mgr = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
    state, _ = mgr.restore(args.checkpoint, state)
    eval_step = jax.jit(make_seg_eval_step(model))

    for batch in loader:
        imgs = jnp.asarray(batch["image"])
        _, masks = eval_step(state, imgs, jnp.zeros(imgs.shape[:3] + (1,)))
        masks = np.asarray(masks)[..., 0]
        for i, name in enumerate(batch["name"]):
            stem = os.path.splitext(name)[0]
            write_mask_png(masks[i], os.path.join(seg_dir, f"{stem}.png"))

    # the reference also writes an (empty) classification workbook (predict.py:50-51)
    import pandas as pd

    try:
        pd.DataFrame([]).to_excel(
            os.path.join(args.out_dir, "Classification_Results.xlsx"), index=False)
    except Exception:  # no xlsx engine in minimal envs — csv fallback
        pd.DataFrame([]).to_csv(
            os.path.join(args.out_dir, "Classification_Results.csv"), index=False)
    print(f"wrote {len(ds)} masks to {seg_dir}", flush=True)


if __name__ == "__main__":
    main()
