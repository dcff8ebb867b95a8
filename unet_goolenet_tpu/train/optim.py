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
