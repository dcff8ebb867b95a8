"""Stage-2 (classification) training step (分类/ROI_main.py:198-241), jitted.

Same two-update refinement shape as stage 1, with the classifier-specific quirks
preserved:
  * the feedback mask is the frozen UNet's logits delivered with the batch
    (`se_out`), cast through int64 in the reference (`.long()`, ROI_main.py:207) —
    i.e. truncated toward zero — before the sigmoid. We mirror with jnp.trunc.
  * loss is a plain CrossEntropy built fresh in the loop (ROI_main.py:228-229); the
    instantiated BCEFocalLoss is never applied.
  * GoogLeNet dropout is active in train mode, so the step threads an rng.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from unet_goolenet_tpu.train.losses import (
    softmax_cross_entropy,
    aux_weighted_cross_entropy,
)
from unet_goolenet_tpu.train.seg import TrainState


def make_cls_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    n_refine: int = 2,
    long_cast_quirk: bool = True,
    aux_weight: float = 0.0,
) -> Callable:
    """(state, imgs, labels, se_out, rng) -> (state, metrics).
    imgs: (N,224,224,3) ROI crops; se_out: (N,224,224,1) frozen-UNet logits.

    `aux_weight > 0` enables GoogLeNet paper-style aux-loss training
    (CE(main) + w*sum CE(aux)); requires the model built with aux_logits=True.
    The reference never exercises aux heads (pretrained torchvision strips
    them) — this is the BASELINE.json-requested extension."""

    def one_pass(params, batch_stats, opt_state, imgs, labels, rng):
        def losses(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            if aux_weight > 0.0:
                main, aux2, aux1 = out
                loss = aux_weighted_cross_entropy(
                    main, [aux1, aux2], labels, aux_weight=aux_weight)
            else:
                loss = softmax_cross_entropy(out, labels)
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(losses, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    def train_step(state: TrainState, imgs, labels, se_out, rng):
        params, stats, opt_state = state
        total = jnp.float32(0.0)
        # ROI_main.py:207-225: tempPred starts as the .long()-cast seg logits and
        # is re-sigmoided each later pass while imgs compound
        temp = jax.lax.stop_gradient(se_out)
        if long_cast_quirk:
            temp = jnp.trunc(temp)  # the reference's .long() round-trip
        cur_imgs = imgs
        for i in range(n_refine):
            if i > 0:
                temp = jax.nn.sigmoid(temp)
                conf = jnp.mean(
                    jnp.abs(0.5 - temp) * 2.0,
                    axis=tuple(range(1, temp.ndim)), keepdims=True,
                )
                cur_imgs = cur_imgs + temp * conf
            rng, sub = jax.random.split(rng)
            params, stats, opt_state, loss = one_pass(
                params, stats, opt_state, cur_imgs, labels, sub
            )
            total = total + loss
        return TrainState(params, stats, opt_state), {"loss": total / n_refine}

    return train_step


def make_cls_eval_step(model) -> Callable:
    """Val step (ROI_main.py:165-195): CE loss + logits for the metric bank."""

    def eval_step(state: TrainState, imgs, labels):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs,
            train=False,
        )
        loss = softmax_cross_entropy(out, labels)
        return loss, out

    return eval_step


def init_cls_state(model, tx, rng, input_shape=(1, 224, 224, 3)) -> TrainState:
    variables = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros(input_shape), train=False
    )
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
