"""Device-resident epoch runner: one jitted lax.scan per epoch.

The BUSI-scale datasets (hundreds of 224² images) fit comfortably in HBM, so the
TPU-idiomatic training loop stages the whole epoch on device once and runs ALL
steps inside a single compiled scan — zero per-step host dispatches (which cost
~12 ms each on remote links, and host-loop overhead everywhere). Shuffling is a
device-side gather with a fresh permutation key per epoch.

Works with any step built by train.seg.make_seg_train_step (the refinement
double-update included).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from unet_goolenet_tpu.train.seg import TrainState


def make_epoch_runner(train_step: Callable, batch_size: int) -> Callable:
    """Returns epoch(state, imgs, labels, key) -> (state, mean_loss).

    imgs (M, H, W, C) / labels (M, H, W, 1) are the full epoch's data, device
    resident; M is truncated to a multiple of batch_size after shuffling
    (drop-last semantics)."""

    @jax.jit
    def run_epoch(state: TrainState, imgs: jax.Array, labels: jax.Array,
                  key: jax.Array) -> Tuple[TrainState, jax.Array]:
        m = imgs.shape[0]
        n_batches = m // batch_size
        perm = jax.random.permutation(key, m)[: n_batches * batch_size]
        bi = imgs[perm].reshape((n_batches, batch_size) + imgs.shape[1:])
        bl = labels[perm].reshape((n_batches, batch_size) + labels.shape[1:])

        def body(state, batch):
            state, metrics = train_step(state, batch[0], batch[1])
            return state, metrics["loss"]

        state, losses = jax.lax.scan(body, state, (bi, bl))
        return state, jnp.mean(losses)

    return run_epoch
