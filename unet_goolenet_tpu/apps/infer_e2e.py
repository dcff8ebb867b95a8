"""End-to-end two-stage inference CLI (reference: 分类/test.py).

Output parity: `<out>/result.txt` with "name grade" lines, sorted numerically by
filename stem (test.py:90-96). The compute path is the fused on-device pipeline —
wavelet -> resize -> UNet -> bbox -> crop -> GoogLeNet in one XLA graph per batch.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from unet_goolenet_tpu.apps.common import load_two_stage
from unet_goolenet_tpu.data import ImageFolderDataset, DataLoader
from unet_goolenet_tpu.utils import seed_everything


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Two-stage segment->crop->classify")
    p.add_argument("--image-dir", required=True)
    p.add_argument("--unet-checkpoint", required=True)
    p.add_argument("--gnet-checkpoint", required=True)
    p.add_argument("--out-dir", default="test_results")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=6)
    p.add_argument("--bf16", action="store_true", help="bf16 streaming inference")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each inference batch over all devices (state "
                        "replicated) — BASELINE config 5's sharded serving "
                        "layout; requires --batch-size divisible by the device "
                        "count. Short final batches are padded by repeating the "
                        "last image and trimmed after grading")
    p.add_argument("--device-preprocess", action="store_true",
                   help="run wavelet+resize on device too: the full fused "
                        "gray->wavelet->resize->UNet->bbox->crop->GoogLeNet graph "
                        "(分类/test.py:122-134 as ONE XLA computation per batch)")
    p.add_argument("--size-buckets", type=int, default=0, metavar="N",
                   help="with --device-preprocess: bound compilation to at "
                        "most N bucket shapes by edge-padding each raw image "
                        "into its bucket (mask-aware wavelet/normalisation, "
                        "valid-region resize — grades match the exact-shape "
                        "path). 0 (default) compiles one graph per exact raw "
                        "(H, W); a warning suggests buckets when that exceeds "
                        f"{COMPILE_GUARD} distinct shapes")
    return p.parse_args(argv)


# --device-preprocess compiles one full-pipeline graph per distinct input
# shape; past this many, compile time dominates and --size-buckets is the
# intended mode (each compile is minutes over the dev tunnel)
COMPILE_GUARD = 8


def bucket_shapes(shapes, n_buckets: int) -> dict:
    """Map each raw (H, W) to one of <= n_buckets even-sized bucket shapes.

    Greedy: unique shapes sorted by area are split into contiguous groups and
    each group's bucket is the elementwise max (rounded up to even) — so every
    image fits its bucket and the number of compiled graphs is bounded."""
    uniq = sorted(set(shapes), key=lambda s: (s[0] * s[1], s))
    n = max(1, min(n_buckets, len(uniq)))
    per = (len(uniq) + n - 1) // n
    mapping = {}
    for i in range(0, len(uniq), per):
        group = uniq[i:i + per]
        bh = max(s[0] for s in group)
        bw = max(s[1] for s in group)
        bucket = (bh + bh % 2, bw + bw % 2)
        for s in group:
            mapping[s] = bucket
    return mapping


def numeric_stem(name: str) -> int:
    stem = name.replace(".jpg", "").replace(".png", "")
    try:
        return int(stem)
    except ValueError:
        return 0


def _run_device_preprocess(pipe, image_dir: str, batch_size: int,
                           records: list, grade_fn=None, size_buckets: int = 0,
                           grade_padded_fn=None) -> int:
    """The north-star fused-from-gray path: raw grayscale images are read at
    NATIVE resolution and the whole 分类/test.py:122-134 flow (wavelet at native
    res -> resize -> UNet -> bbox -> crop -> GoogLeNet) runs as one jitted graph.

    jit specialises on input shape; two grouping modes bound the compiles:
      * exact (size_buckets=0): one compile per distinct raw (H, W) — bitwise
        the single-image semantics, with a warning past COMPILE_GUARD shapes;
      * bucketed (size_buckets=N): images are edge-padded into <= N bucket
        buffers and graded by the mask-aware padded graph
        (pipeline.preprocess_gray_padded) — bounded compiles on arbitrarily
        heterogeneous archives.
    The final partial chunk of a group is padded to the full batch by
    repeating its last image and trimmed. Returns the number of images graded.
    `grade_fn`/`grade_padded_fn` override the pipe runners (the
    --data-parallel path passes the mesh-sharded ones)."""
    from unet_goolenet_tpu.data.datasets import _imread

    if grade_fn is None:
        grade_fn = pipe.infer_grades
    if grade_padded_fn is None:
        grade_padded_fn = pipe.infer_grades_padded

    names = sorted(os.listdir(image_dir))
    loaded = [(name, _imread(os.path.join(image_dir, name), grayscale=True))
              for name in names]

    groups: dict = {}
    if size_buckets:
        mapping = bucket_shapes([g.shape for _, g in loaded], size_buckets)
        for name, gray in loaded:
            groups.setdefault(mapping[gray.shape], []).append((name, gray))
    else:
        for name, gray in loaded:
            groups.setdefault(gray.shape, []).append((name, gray))
        if len(groups) > COMPILE_GUARD:
            print(f"warning: {len(groups)} distinct raw sizes -> "
                  f"{len(groups)} full-pipeline compiles; consider "
                  f"--size-buckets {COMPILE_GUARD} (bounded compiles, "
                  "grade-parity padded path)", flush=True)

    n = 0
    for shape in sorted(groups):
        items = groups[shape]
        for i in range(0, len(items), batch_size):
            chunk = items[i:i + batch_size]
            k = len(chunk)
            if size_buckets:
                bh, bw = shape
                batch = np.stack([
                    np.pad(g.astype(np.float32),
                           ((0, bh - g.shape[0]), (0, bw - g.shape[1])),
                           mode="edge")
                    for _, g in chunk])
                valid = np.asarray([g.shape for _, g in chunk], np.int32)
            else:
                batch = np.stack([g for _, g in chunk]).astype(np.float32)
                valid = None
            if k < batch_size:
                pad = batch_size - k
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], pad, axis=0)])
                if valid is not None:
                    valid = np.concatenate(
                        [valid, np.repeat(valid[-1:], pad, axis=0)])
            if valid is None:
                grades = np.asarray(grade_fn(jnp.asarray(batch)))[:k]
            else:
                grades = np.asarray(
                    grade_padded_fn(jnp.asarray(batch), valid))[:k]
            n += k
            for (name, _), grade in zip(chunk, grades):
                stem = name.replace(".png", "")
                records.append(f"{stem} {int(grade)}")
    return n


def main(argv=None):
    args = parse_args(argv)
    if args.size_buckets and not args.device_preprocess:
        # the host-preprocess path resizes per image and never compiles per
        # shape; accepting the flag there would silently do nothing
        raise SystemExit("--size-buckets only applies with --device-preprocess")
    key = seed_everything()
    os.makedirs(args.out_dir, exist_ok=True)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    use_dp = args.data_parallel and len(jax.devices()) > 1
    pipe = load_two_stage(
        args.unet_checkpoint, args.gnet_checkpoint, key,
        img_size=args.img_size, num_classes=args.num_classes, dtype=dtype,
        fused_up1=None)  # dp runners shard_map per device, Pallas tail works

    grade_fn = None
    grade_padded_fn = None
    rgb_fn = pipe.infer_from_rgb
    if use_dp:
        from unet_goolenet_tpu.parallel import make_mesh, make_sharded_pipeline

        mesh = make_mesh()
        n_dev = mesh.shape["data"]
        if args.batch_size % n_dev:
            raise SystemExit(f"--data-parallel: --batch-size {args.batch_size} "
                             f"must be divisible by the device count {n_dev}")
        grade_fn = make_sharded_pipeline(pipe, mesh, source="grades")
        grade_padded_fn = make_sharded_pipeline(pipe, mesh,
                                                source="grades_padded")
        rgb_fn = make_sharded_pipeline(pipe, mesh, source="rgb")

    records = []
    t0 = time.time()
    n = 0
    if args.device_preprocess:
        n = _run_device_preprocess(pipe, args.image_dir, args.batch_size,
                                   records, grade_fn=grade_fn,
                                   size_buckets=args.size_buckets,
                                   grade_padded_fn=grade_padded_fn)
    else:
        ds = ImageFolderDataset(args.image_dir, img_size=args.img_size, wavelet=True)
        loader = DataLoader(ds, args.batch_size)
        for batch in loader:
            imgs = np.asarray(batch["image"])
            k = len(imgs)
            if args.data_parallel and k < args.batch_size:
                # pad the short final batch to the jitted shape (the sharded
                # runner divides N across devices); trimmed below
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], args.batch_size - k, axis=0)])
            out = rgb_fn(jnp.asarray(imgs))
            grades = np.asarray(out["grades"])[:k]
            n += len(grades)
            for name, grade in zip(batch["name"], grades):
                stem = name.replace(".png", "")
                records.append(f"{stem} {int(grade)}")
    dt = time.time() - t0

    records.sort(key=lambda r: numeric_stem(r.split()[0]))
    out_path = os.path.join(args.out_dir, "result.txt")
    with open(out_path, "w") as f:
        f.write("\n".join(records) + ("\n" if records else ""))
    print(f"wrote {len(records)} predictions to {out_path} "
          f"({n / dt:.2f} images/sec incl. host IO)", flush=True)


if __name__ == "__main__":
    main()
