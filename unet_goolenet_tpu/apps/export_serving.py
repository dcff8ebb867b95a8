"""Export the two-stage serving graph as a deployment artifact.

The reference's "deployment" is re-running the training repo
(分类/test.py:139-152: both torch models loaded at import, eager Python per
batch). This CLI freezes the trained checkpoints + the whole fused serving
graph into a directory (StableHLO + weights, pipeline/export.py) that a
serving host runs with load_serving() — no model code, no re-trace,
batch-polymorphic:

    python -m unet_goolenet_tpu.apps.export_serving \
        --unet-checkpoint ckpt/seg/best_model_epoch7 \
        --gnet-checkpoint ckpt/cls/best_model_epoch3 \
        --raw-hw 400 500 --out-dir artifact/ --check
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from unet_goolenet_tpu.apps.common import load_two_stage
from unet_goolenet_tpu.pipeline.export import export_serving, load_serving
from unet_goolenet_tpu.utils.seed import seed_everything


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--unet-checkpoint", required=True)
    p.add_argument("--gnet-checkpoint", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=6)
    p.add_argument("--raw-hw", type=int, nargs=2, default=None, metavar=("H", "W"),
                   help="raw grayscale input size fixed into the graph "
                        "(source=gray); required unless --source rgb")
    p.add_argument("--source", choices=["gray", "rgb"], default="gray")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute inside the graph (f32 in/out)")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and assert grade parity vs the "
                        "live pipeline on a random batch")
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"],
                   choices=["cpu", "tpu", "cuda"],
                   help="lowering targets baked into the artifact (default: "
                        "cpu tpu — a CPU build box emits the TPU artifact)")
    p.add_argument("--static-batch", type=int, default=0,
                   help="fix the batch at export instead of symbolic N "
                        "(0 = batch-polymorphic). The loaded runner serves "
                        "any N by pad+chunk+slice. A static batch at/above "
                        "the dense crossover ships the measured-fastest "
                        "dense graph (export.py static_batch docs)")
    p.add_argument("--keep-fused", action="store_true",
                   help="build the pipeline with its production defaults "
                        "(Pallas fused levels on TPU) and export them into "
                        "the artifact — fastest, but same-jax-version "
                        "same-backend only; combine with --static-batch >= "
                        "128 to ship the hybrid dense+fused-up1 graph")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.source == "gray" and args.raw_hw is None:
        raise SystemExit("--raw-hw H W is required with --source gray")
    key = seed_everything()

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.keep_fused:
        # production defaults (Pallas fused levels where measured fastest)
        fused_kw = {}
    else:
        # pure-XLA graph: portable StableHLO, no Pallas custom calls (export.py)
        fused_kw = dict(fused_up1=False, fused_up2=False, fused_up34=False,
                        fused_down1=False, dense_fused_up1=False)
    pipe = load_two_stage(
        args.unet_checkpoint, args.gnet_checkpoint, key,
        img_size=args.img_size, num_classes=args.num_classes, dtype=dtype,
        **fused_kw)

    meta = export_serving(pipe, args.out_dir, source=args.source,
                          raw_hw=tuple(args.raw_hw) if args.raw_hw else None,
                          static_batch=args.static_batch or None,
                          keep_fused=args.keep_fused,
                          platforms=tuple(args.platforms))
    print(f"exported {meta['source']} serving graph "
          f"(raw_hw={meta['raw_hw']}, img_size={meta['img_size']}, "
          f"dtype={meta['dtype']}, platforms={meta['platforms']}, "
          f"static_batch={meta['static_batch']}, "
          f"fused={meta['fused_levels']}) to {args.out_dir}", flush=True)

    if args.check:
        runner = load_serving(args.out_dir)
        rng = np.random.default_rng(0)
        if args.source == "gray":
            batch = rng.uniform(0, 255, (2, *meta["raw_hw"])).astype(np.float32)
            want = pipe.infer_grades(jnp.asarray(batch))
        else:
            batch = rng.uniform(0, 1, (2, *meta["raw_hw"], 3)).astype(np.float32)
            want = pipe.infer_from_rgb(jnp.asarray(batch))["grades"]
        got = runner(batch)
        assert (np.asarray(got) == np.asarray(want)).all(), (got, want)
        print(f"check ok: artifact grades == live pipeline {np.asarray(got)}",
              flush=True)


if __name__ == "__main__":
    main()
