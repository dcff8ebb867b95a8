"""Training-step throughput (BASELINE.json config 4: UNet training step, BCE+Dice,
with backward convs). Prints one JSON line; runs on the default (TPU) backend.

The refinement train step does 2 forward+backward passes and 2 optimizer updates
per batch (reference semantics), so `images/sec` counts each image once per
BATCH, not per pass.

Measured as ONE jitted lax.scan over `iters` steps carrying the train state
(fetching only the final loss), so the number is steady-state chip throughput,
not the dev tunnel's ~36 ms/step dispatch+fetch round trip (see
memory/axon-tpu-tunnel-rules.md). `--bf16` measures the mixed-precision mode
(bf16 compute, f32 params/optimizer — apps/train_seg.py --bf16).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("seg", "cls"), default="seg",
                    help="seg: stage-1 UNet refinement step (config 4). "
                         "cls: stage-2 — frozen-UNet ROI extraction "
                         "(apps/train_cls --engine-roi) + GoogLeNet "
                         "refinement train step (分类/ROI_main.py:198-241)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--flax-roi", action="store_true",
                    help="cls mode: flax-apply UNet extractor instead of the "
                         "packed engine forward (--engine-roi off)")
    ap.add_argument("--fused-roi", action="store_true",
                    help="cls mode: enable the fused Pallas decoder levels "
                         "in the frozen-UNet extractor (serving kernels)")
    ap.add_argument("--split", action="store_true",
                    help="cls mode: additionally time ROI / fwd / fwd+bwd "
                         "segments (scan-timed like the whole step)")
    ap.add_argument("--packed", action="store_true",
                    help="use the pixel-packed engine train forward "
                         "(pipeline/engine_train.py)")
    ap.add_argument("--dense-up1", action="store_true",
                    help="packed forward with a DENSE up1+outc tail "
                         "(engine_train dense_up1 — the queue-19 backward "
                         "attribution's lever on the packed up1's 2x-FLOP "
                         "backward); implies --packed")
    ap.add_argument("--remat", default="",
                    help="comma list of engine levels to jax.checkpoint "
                         "(up1,up2,inc) or 'all' (packed forward only)")
    ap.add_argument("--flat-opt", action="store_true",
                    help="AdamW on one raveled parameter vector instead of "
                         "per-leaf (optim.make_adamw_flat; same update rule)")
    ap.add_argument("--flat-state", action="store_true",
                    help="FLAT-STATE training: params live as one raveled "
                         "vector, unravelled inside the forward — the grads "
                         "arrive flat and the optimizer is a handful of "
                         "full-vector kernels (seg.flatten_seg_state)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    if args.mode == "cls":
        return _cls_bench(args)
    from unet_goolenet_tpu.models import UNetTaskAligWeight
    from unet_goolenet_tpu.train import optim
    from unet_goolenet_tpu.train.seg import (
        flatten_seg_state,
        init_seg_state,
        make_seg_train_step,
    )

    model = UNetTaskAligWeight(
        n_classes=1, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    tx = (optim.make_adamw_flat(1e-4) if (args.flat_opt or args.flat_state)
          else optim.make_adamw(1e-4))
    state = init_seg_state(model, tx, jax.random.PRNGKey(0),
                           input_shape=(1, 224, 224, 3))
    unravel = None
    if args.flat_state:
        state, unravel = flatten_seg_state(state, tx)
    fwd = ("engine-packed-dense-up1" if args.dense_up1
           else "engine-packed" if args.packed else "flax")
    step = make_seg_train_step(
        model, tx, forward=fwd,
        remat=tuple(args.remat.split(",")) if args.remat else (),
        unravel=unravel)

    imgs = jax.random.uniform(jax.random.PRNGKey(1), (args.batch, 224, 224, 3))
    labels = (jax.random.uniform(jax.random.PRNGKey(2),
                                 (args.batch, 224, 224, 1)) > 0.7
              ).astype(jnp.float32)

    @jax.jit
    def run(state, imgs, labels):
        def body(st, _):
            st, metrics = step(st, imgs, labels)
            return st, metrics["loss"]

        state, losses = jax.lax.scan(body, state, None, length=args.iters)
        return state, losses

    _, losses = run(state, imgs, labels)
    _ = np.asarray(losses)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, losses = run(state, imgs, labels)
        _ = np.asarray(losses)  # force execution of every step
        best = min(best, time.perf_counter() - t0)
    dt = best / args.iters
    print(json.dumps({
        "metric": "seg_train_step_throughput",
        "value": round(args.batch / dt, 3),
        "unit": "images/sec/chip",
        "ms_per_step": round(dt * 1000, 2),
        "batch": args.batch,
        "bf16": bool(args.bf16),
        "packed": bool(args.packed),
        "dense_up1": bool(args.dense_up1),
        "flat_opt": bool(args.flat_opt),
        "flat_state": bool(args.flat_state),
    }))


def _cls_bench(args) -> None:
    """Stage-2 steady-state throughput: ONE jitted scan whose body is the
    full per-batch work the train loop pays (apps/train_cls.py:267-271,
    313) — frozen-UNet ROI extraction + the 2-pass GoogLeNet refinement
    step. The reference pays the extraction inside Dataset.__getitem__ on
    CUDA per IMAGE (分类/ROI_main.py:142-162); here it is one batched
    device graph fused into the step."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet_goolenet_tpu.apps.train_cls import make_roi_extractor
    from unet_goolenet_tpu.models import GoogLeNetClassifier, UNetTaskAligWeight
    from unet_goolenet_tpu.pipeline.two_stage import extract_roi
    from unet_goolenet_tpu.train import optim
    from unet_goolenet_tpu.train.cls import init_cls_state, make_cls_train_step

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    S = 224
    key = jax.random.PRNGKey(0)
    unet = UNetTaskAligWeight(n_classes=1, dtype=dtype)
    unet_vars = unet.init({"params": key}, jnp.zeros((1, S, S, 3)),
                          train=False)
    gnet = GoogLeNetClassifier(num_classes=6, dtype=dtype)
    tx = optim.make_adamw(1e-4)
    state = init_cls_state(gnet, tx, key, input_shape=(1, S, S, 3))
    train_step = make_cls_train_step(gnet, tx)

    engine = not args.flax_roi
    if engine:
        from unet_goolenet_tpu.pipeline import engine as _engine

        def unet_fwd(imgs):
            return _engine.unet_forward_packed(
                unet_vars, imgs, fused_up1=args.fused_roi,
                fused_up2=args.fused_roi, fused_up34=args.fused_roi,
                fused_down1=args.fused_roi)
    else:
        def unet_fwd(imgs):
            return unet.apply(unet_vars, imgs, train=False)

    def extract(imgs):
        # same graph as make_roi_extractor (apps/train_cls.py:87-118), open
        # so it can sit INSIDE the scan body
        logits = unet_fwd(imgs)
        masks = (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.float32)
        crops, _ = extract_roi(imgs, masks, out_hw=(S, S))
        return crops, logits

    b = args.batch
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (b, S, S, 3),
                              dtype=jnp.float32).astype(dtype)
    labels = jax.random.randint(jax.random.PRNGKey(2), (b,), 0, 6)
    rng0 = jax.random.PRNGKey(3)

    def scan_time(body0, carry0, label):
        @jax.jit
        def run(carry, steps):
            def body(c, s):
                return body0(c, s)

            carry, outs = jax.lax.scan(body, carry, steps)
            return carry, outs

        steps = jnp.arange(args.iters, dtype=jnp.float32) * 1e-6
        _, outs = run(carry0, steps)
        _ = np.asarray(jax.tree_util.tree_leaves(outs)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, outs = run(carry0, steps)
            _ = np.asarray(jax.tree_util.tree_leaves(outs)[0])
            best = min(best, time.perf_counter() - t0)
        ms = best / args.iters * 1e3
        if args.split:
            print(f"  [{label}] {ms:.2f} ms/step", flush=True)
        return ms

    # ---- the real per-batch work: extract + refinement step ---------------
    def full_body(carry, s):
        st, rng = carry
        rng, sub = jax.random.split(rng)
        im = imgs * (1 + s).astype(dtype)         # defeat cross-step CSE
        crops, se_out = extract(im)
        st, metrics = train_step(st, crops, labels, se_out, sub)
        return (st, rng), metrics["loss"]

    ms_full = scan_time(full_body, (state, rng0), "extract+step (FULL)")

    segments = {}
    if args.split:
        def roi_body(carry, s):
            im = imgs * (1 + s).astype(dtype)
            crops, se_out = extract(im)
            return carry, jnp.sum(crops.astype(jnp.float32)) + jnp.sum(
                se_out.astype(jnp.float32))

        segments["roi_ms"] = round(scan_time(roi_body, 0, "ROI extract"), 2)

        crops0, se0 = jax.jit(extract)(imgs)

        def fwd_body(carry, s):
            cr = crops0 * (1 + s).astype(dtype)
            out = gnet.apply({"params": state.params,
                              "batch_stats": state.batch_stats},
                             cr, train=False)
            return carry, jnp.sum(out.astype(jnp.float32))

        segments["gnet_fwd_ms"] = round(
            scan_time(fwd_body, 0, "gnet fwd (eval, x1)"), 2)

        def step_body(carry, s):
            st, rng = carry
            rng, sub = jax.random.split(rng)
            cr = crops0 * (1 + s).astype(dtype)
            st, metrics = train_step(st, cr, labels, se0, sub)
            return (st, rng), metrics["loss"]

        segments["step_ms"] = round(
            scan_time(step_body, (state, rng0), "train step only (2-pass)"),
            2)

    dt = ms_full / 1e3
    print(json.dumps({
        "metric": "cls_train_step_throughput",
        "value": round(b / dt, 3),
        "unit": "images/sec/chip",
        "ms_per_step": round(ms_full, 2),
        "batch": b,
        "bf16": bool(args.bf16),
        "engine_roi": engine,
        "fused_roi": bool(args.fused_roi),
        **segments,
    }))


if __name__ == "__main__":
    main()
