"""Serve the two-stage grader over HTTP with TPU micro-batching.

The reference's serving story is 分类/test.py — a script re-run per dataset,
models reloaded each time, no server. This CLI is the production grading
endpoint, in two modes:

  artifact (default): serve an export_serving directory (StableHLO + weights,
  apps/export_serving.py) — no model code re-traced on the host:

      python -m unet_goolenet_tpu.apps.serve --artifact artifact/ --port 8000

  live (--live): build the fused pipeline from checkpoints and serve it
  directly, optionally sharded over every chip in the mesh (BASELINE config
  5's layout) — the Pallas-fused levels stay available here, unlike the
  portable artifact:

      python -m unet_goolenet_tpu.apps.serve --live \\
          --unet-checkpoint ckpt/seg/best --gnet-checkpoint ckpt/cls/best \\
          --raw-hw 400 500 [--bf16] [--data-parallel] --port 8000

    curl -X POST --data-binary @img.npy localhost:8000/v1/grade
    curl localhost:8000/healthz

Concurrent requests are coalesced into single padded device batches
(pipeline/serving.py): the chip sees power-of-two batches <= --max-batch
(bounded compile count; under --data-parallel also divisible by the mesh
size), requests wait at most --max-wait-ms for peers.
"""

from __future__ import annotations

import argparse

from unet_goolenet_tpu.pipeline.serving import GradingServer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact",
                   help="export_serving output directory (artifact mode)")
    p.add_argument("--live", action="store_true",
                   help="serve the live pipeline from checkpoints instead of "
                        "an artifact (enables Pallas-fused levels and "
                        "--data-parallel)")
    p.add_argument("--unet-checkpoint", help="(--live) stage-1 checkpoint")
    p.add_argument("--gnet-checkpoint", help="(--live) stage-2 checkpoint")
    p.add_argument("--raw-hw", type=int, nargs=2, metavar=("H", "W"),
                   help="(--live) raw grayscale input size the graph is "
                        "specialised to")
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=6)
    p.add_argument("--bf16", action="store_true",
                   help="(--live) bf16 compute (f32 in/out)")
    p.add_argument("--data-parallel", action="store_true",
                   help="(--live) shard device batches over the full mesh")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--max-batch", type=int, default=64,
                   help="device batch cap; compiles <= log2(max_batch)+1 "
                        "programs")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="micro-batching window after the first request")
    p.add_argument("--grade-timeout-s", type=float, default=600.0,
                   help="per-request wait bound; the first call per pow2 "
                        "bucket pays an XLA compile, so keep this generous")
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile every batch bucket before accepting "
                        "traffic (no request pays a first-call compile)")
    p.add_argument("--no-overlap", action="store_true",
                   help="disable the double-buffered dispatcher (dispatch "
                        "batch k+1 before fetching batch k's grades — "
                        "default on; see pipeline/serving.MicroBatcher)")
    return p.parse_args(argv)


def _build_live(args):
    import jax.numpy as jnp

    from unet_goolenet_tpu.apps.common import load_two_stage
    from unet_goolenet_tpu.utils.seed import seed_everything

    for flag in ("unet_checkpoint", "gnet_checkpoint", "raw_hw"):
        if getattr(args, flag) is None:
            raise SystemExit(f"--live requires --{flag.replace('_', '-')}")

    key = seed_everything()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    pipe = load_two_stage(
        args.unet_checkpoint, args.gnet_checkpoint, key,
        img_size=args.img_size, num_classes=args.num_classes, dtype=dtype)

    meta = {"mode": "live", "source": "gray", "raw_hw": list(args.raw_hw),
            "img_size": args.img_size, "dtype": jnp.dtype(dtype).name,
            "data_parallel": args.data_parallel,
            "fused_levels": [k for k in ("fused_up1", "fused_up2",
                                         "fused_up34", "fused_down1")
                             if getattr(pipe, k, False)]}
    if args.data_parallel:
        from unet_goolenet_tpu.parallel import make_mesh, make_sharded_pipeline
        mesh = make_mesh()
        meta["mesh_devices"] = mesh.devices.size
        return (make_sharded_pipeline(pipe, mesh, source="grades"),
                meta, mesh.devices.size)
    return (lambda b: pipe.infer_grades(jnp.asarray(b))), meta, 1


def main(argv=None):
    args = parse_args(argv)
    if args.live == (args.artifact is not None):
        raise SystemExit("pass exactly one of --artifact or --live")

    if args.live:
        grade_fn, meta, pad_multiple = _build_live(args)
    else:
        from unet_goolenet_tpu.pipeline.export import load_serving
        grade_fn = load_serving(args.artifact)
        meta, pad_multiple = grade_fn.meta, 1

    server = GradingServer(grade_fn, max_batch=args.max_batch,
                           max_wait_ms=args.max_wait_ms,
                           pad_multiple=pad_multiple,
                           grade_timeout_s=args.grade_timeout_s, meta=meta,
                           overlap=not args.no_overlap)
    if args.warmup:
        print("warming batch buckets...", flush=True)
        print(f"warmed buckets {server.warmup()}", flush=True)
    print(f"serving {'live pipeline' if args.live else args.artifact} "
          f"(raw_hw={meta.get('raw_hw')}, "
          f"{'mesh=' + str(meta['mesh_devices']) + ' devices, ' if 'mesh_devices' in meta else ''}"
          f"platforms={meta.get('platforms', 'live')}) "
          f"on {args.host}:{args.port}", flush=True)
    try:
        server.serve(port=args.port, host=args.host)
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main()
