"""Determinism helpers (reference: seed_everything, 分割/main.py:194-202).

JAX is functionally deterministic given a PRNGKey; this seeds the host-side RNGs
(python random, numpy) used by augmentation/shuffling and returns the root jax key.
"""

from __future__ import annotations

import random

import numpy as np
import jax


def seed_everything(seed: int = 1234) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
