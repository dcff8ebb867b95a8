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


def make_cls_epoch_runner(train_step: Callable, batch_size: int) -> Callable:
    """Stage-2 twin of make_epoch_runner: scans the cls train step over shuffled
    (crops, labels, se_out) triples with a per-step dropout rng.

    Combined with the on-device frozen-UNet ROI extraction and device
    augmentation, the entire stage-2 epoch is one compiled program — the
    polar opposite of the reference, which ran the UNet per-item inside
    Dataset.__getitem__ (ROI_main.py:142-162)."""

    @jax.jit
    def run_epoch(state: TrainState, crops: jax.Array, labels: jax.Array,
                  se_out: jax.Array, key: jax.Array) -> Tuple[TrainState, jax.Array]:
        m = crops.shape[0]
        n_batches = m // batch_size
        skey, rkey = jax.random.split(key)
        perm = jax.random.permutation(skey, m)[: n_batches * batch_size]
        bc = crops[perm].reshape((n_batches, batch_size) + crops.shape[1:])
        bl = labels[perm].reshape((n_batches, batch_size))
        bs = se_out[perm].reshape((n_batches, batch_size) + se_out.shape[1:])
        rngs = jax.random.split(rkey, n_batches)

        def body(state, batch):
            c, l, s, r = batch
            state, metrics = train_step(state, c, l, s, r)
            return state, metrics["loss"]

        state, losses = jax.lax.scan(body, state, (bc, bl, bs, rngs))
        return state, jnp.mean(losses)

    return run_epoch


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
