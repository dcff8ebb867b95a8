"""Optimizer, LR schedule, and early stopping.

Mirrors the reference recipe (分割/main.py:240-243, 252-290):
  * AdamW(lr=1e-4) — optax.adamw with torch-default betas/eps/weight_decay;
  * ReduceLROnPlateau(mode=min, factor=0.1, patience=10, threshold=1e-3 abs,
    min_lr=1e-5), stepped on the EPOCH TRAIN loss (a reference quirk);
  * early stop with "patience extension": counter > patience triggers stop only once
    lr has decayed below the threshold; otherwise the counter is rolled back by 20
    ("My patience ended, but I believe I need more time", main.py:284-290).

The plateau scheduler is a pure pytree so it lives inside jitted epoch loops if
needed; torch semantics are reproduced exactly (abs threshold, floor at min_lr).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.flatten_util  # jax.flatten_util.ravel_pytree needs the explicit import
import jax.numpy as jnp
import optax


def make_adamw(learning_rate: float = 1e-4, weight_decay: float = 0.01):
    """torch.optim.AdamW defaults: betas (0.9, 0.999), eps 1e-8, wd 0.01.
    Wrapped in inject_hyperparams so the plateau scheduler can rescale the lr by
    writing opt_state.hyperparams['learning_rate']."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=weight_decay,
    )


class FlatAdamWState(NamedTuple):
    count: jnp.ndarray
    m: jnp.ndarray  # first moment, one flat f32 vector over all leaves
    v: jnp.ndarray  # second moment, same layout
    hyperparams: dict  # {"learning_rate": f32 scalar} — set_learning_rate target


def make_adamw_flat(learning_rate: float = 1e-4, weight_decay: float = 0.01,
                    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """AdamW with the moment math on ONE raveled parameter vector.

    Identical update rule to make_adamw (optax.adamw: bias-corrected moments,
    decoupled weight decay on every leaf, matching the reference's
    torch.optim.AdamW defaults, 分割/main.py:240) — only the schedule differs:
    instead of per-leaf m/v updates (169 leaves for the flagship UNet, 116 of
    them tiny), grads and params are raveled once and the whole Adam step runs
    as a handful of full-vector kernels. An on-chip A/B experiment for the
    train step's optimizer glue (benchmarks/RESULTS.md queue-7); parity with
    the tree optimizer is asserted in tests/test_train.py.

    Same lr-rescale contract as make_adamw: plateau scheduling writes
    opt_state.hyperparams['learning_rate'] (set_learning_rate). Checkpoints of
    the two optimizers are not interchangeable (flat vs per-leaf state trees).
    """

    def init(params) -> FlatAdamWState:
        flat, _ = jax.flatten_util.ravel_pytree(params)
        # m and v must be DISTINCT buffers: train steps donate the opt_state,
        # and aliasing one zeros array into both fields donates it twice
        return FlatAdamWState(
            count=jnp.zeros([], jnp.int32),
            m=jnp.zeros(flat.shape, jnp.float32),
            v=jnp.zeros(flat.shape, jnp.float32),
            hyperparams={"learning_rate": jnp.float32(learning_rate)},
        )

    def update(grads, state: FlatAdamWState, params):
        if params is None:
            raise ValueError("make_adamw_flat requires params (weight decay)")
        g, _ = jax.flatten_util.ravel_pytree(grads)
        p, unravel = jax.flatten_util.ravel_pytree(params)
        g = g.astype(jnp.float32)
        count = state.count + 1
        m = b1 * state.m + (1.0 - b1) * g
        v = b2 * state.v + (1.0 - b2) * jnp.square(g)
        t = count.astype(jnp.float32)
        mhat = m / (1.0 - b1**t)
        vhat = v / (1.0 - b2**t)
        lr = state.hyperparams["learning_rate"]
        upd = -lr * (mhat / (jnp.sqrt(vhat) + eps)
                     + weight_decay * p.astype(jnp.float32))
        new_state = FlatAdamWState(count=count, m=m, v=v,
                                   hyperparams={"learning_rate": lr})
        return unravel(upd), new_state

    return optax.GradientTransformation(init, update)


class PlateauState(NamedTuple):
    lr: jnp.ndarray  # current learning rate
    best: jnp.ndarray  # best (lowest) loss seen
    num_bad: jnp.ndarray  # epochs since improvement


def plateau_init(base_lr: float) -> PlateauState:
    return PlateauState(
        lr=jnp.float32(base_lr),
        best=jnp.float32(jnp.inf),
        num_bad=jnp.int32(0),
    )


def plateau_step(
    state: PlateauState,
    loss: jax.Array,
    *,
    factor: float = 0.1,
    patience: int = 10,
    threshold: float = 1e-3,
    min_lr: float = 1e-5,
) -> PlateauState:
    """One scheduler step (torch ReduceLROnPlateau, mode='min',
    threshold_mode='abs')."""
    loss = loss.astype(jnp.float32)
    improved = loss < state.best - threshold
    best = jnp.where(improved, loss, state.best)
    num_bad = jnp.where(improved, 0, state.num_bad + 1)
    reduce = num_bad > patience
    lr = jnp.where(reduce, jnp.maximum(state.lr * factor, min_lr), state.lr)
    num_bad = jnp.where(reduce, 0, num_bad)
    return PlateauState(lr=lr, best=best, num_bad=num_bad)


def set_learning_rate(opt_state, lr) -> None:
    """Write the (possibly plateau-reduced) lr into an inject_hyperparams state.
    Copies the value: opt_state is typically donated to the jitted train step, and
    aliasing the scheduler's own buffer into it would get that buffer deleted."""
    opt_state.hyperparams["learning_rate"] = jnp.float32(1.0) * jnp.asarray(
        lr, jnp.float32
    )


class EarlyStopper:
    """Host-side early stopping with the reference's patience-extension quirk
    (main.py:269-290). Track the counter on best-val-loss improvements; when the
    counter exceeds patience, stop only if lr < lr_threshold, else roll the counter
    back by `extension`."""

    def __init__(self, patience: int = 50, lr_threshold: float = 1e-4, extension: int = 20):
        self.patience = patience
        self.lr_threshold = lr_threshold
        self.extension = extension
        self.counter = 0
        self.best_loss = float("inf")

    def update(self, val_loss: float, current_lr: float) -> bool:
        """Returns True when training should stop."""
        if val_loss < self.best_loss:
            self.best_loss = val_loss
            self.counter = 0
            return False
        self.counter += 1
        if self.counter > self.patience:
            if current_lr >= self.lr_threshold:
                # "My patience ended, but I believe I need more time"
                self.counter -= self.extension
                return False
            return True
        return False
