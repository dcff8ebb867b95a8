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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--packed", action="store_true",
                    help="use the pixel-packed engine train forward "
                         "(pipeline/engine_train.py)")
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
    step = make_seg_train_step(
        model, tx, forward="engine-packed" if args.packed else "flax",
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
        "flat_opt": bool(args.flat_opt),
        "flat_state": bool(args.flat_state),
    }))


if __name__ == "__main__":
    main()
