"""PyTorch-default parameter initializers.

The reference never sets explicit inits, so every layer uses torch defaults:
`kaiming_uniform_(a=sqrt(5))` for conv/linear kernels and `U(+-1/sqrt(fan_in))` for
biases — both reduce to uniform(+-1/sqrt(fan_in)). Reproducing them keeps
training-from-scratch dynamics comparable with the reference.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _fan_in_conv(shape) -> int:
    # HWIO: fan_in = kh * kw * cin
    kh, kw, cin, _ = shape
    return kh * kw * cin


def torch_conv_init(key, shape, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(_fan_in_conv(shape))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_init(key, shape, dtype=jnp.float32):
    # (in, out) kernel
    bound = 1.0 / np.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
