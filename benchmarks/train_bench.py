"""Training-step throughput (BASELINE.json config 4: UNet training step, BCE+Dice,
with backward convs). Prints one JSON line; runs on the default (TPU) backend.

The refinement train step does 2 forward+backward passes and 2 optimizer updates
per batch (reference semantics), so `images/sec` counts each image once per
BATCH, not per pass.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(batch: int = 8, iters: int = 10) -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from unet_goolenet_tpu.models import UNetTaskAligWeight
    from unet_goolenet_tpu.train import optim
    from unet_goolenet_tpu.train.seg import init_seg_state, make_seg_train_step

    model = UNetTaskAligWeight(n_classes=1)
    tx = optim.make_adamw(1e-4)
    state = init_seg_state(model, tx, jax.random.PRNGKey(0),
                           input_shape=(1, 224, 224, 3))
    step = jax.jit(make_seg_train_step(model, tx), donate_argnums=0)

    imgs = jax.random.uniform(jax.random.PRNGKey(1), (batch, 224, 224, 3))
    labels = (jax.random.uniform(jax.random.PRNGKey(2), (batch, 224, 224, 1)) > 0.7
              ).astype(jnp.float32)

    state, metrics = step(state, imgs, labels)
    _ = float(metrics["loss"])  # force compile + first step
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, imgs, labels)
        _ = float(metrics["loss"])  # forces each step (remote backends)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "seg_train_step_throughput",
        "value": round(batch * iters / dt, 3),
        "unit": "images/sec/chip",
        "ms_per_step": round(dt / iters * 1000, 2),
        "batch": batch,
    }))


if __name__ == "__main__":
    main()
