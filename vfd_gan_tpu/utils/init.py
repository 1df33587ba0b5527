"""Parameter initialisers reproducing the reference's init distributions.

The reference applies ``weights_init`` after construction
(lib/utils.py:51-56): every ``nn.Conv3d`` kernel ~ N(0, 0.02), every
``nn.BatchNorm3d`` scale ~ N(1, 0.02) with zero bias.  Everything else
(Linear, Conv2d, ConvTranspose3d, conv *biases*) keeps PyTorch's default
init, which is U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both weights and
biases (kaiming_uniform with a=sqrt(5) reduces to exactly that bound).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dcgan_normal_init(stddev: float = 0.02):
    """N(0, stddev) for conv kernels hit by reference ``weights_init``."""
    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)
    return init


def bn_scale_init(stddev: float = 0.02):
    """N(1, stddev) for BatchNorm scale (lib/utils.py:55)."""
    def init(key, shape, dtype=jnp.float32):
        return 1.0 + stddev * jax.random.normal(key, shape, dtype)
    return init


def torch_default_init(fan_in: int):
    """U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — PyTorch's default for Linear /
    Conv weights and all biases."""
    bound = 1.0 / (fan_in ** 0.5) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init
