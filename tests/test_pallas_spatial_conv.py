"""Pallas 3x3 spatial conv vs lax conv (interpret mode), fwd + custom VJP."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vfd_gan_tpu.ops.pallas.spatial_conv import conv3x3_pallas

rng = np.random.default_rng(3)


def _lax_conv(x4, w):
    return lax.conv_general_dilated(
        x4, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_fwd_matches_lax():
    x = jnp.asarray(rng.normal(size=(3, 16, 24, 10)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 10, 7)).astype(np.float32) * 0.1)
    got = conv3x3_pallas(x, w, True)
    want = _lax_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_vjp_matches_lax():
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 6, 5)).astype(np.float32) * 0.1)

    def loss_p(x, w):
        return jnp.sum(conv3x3_pallas(x, w, True) ** 2)

    def loss_l(x, w):
        return jnp.sum(_lax_conv(x, w) ** 2)

    gx_p, gw_p = jax.grad(loss_p, argnums=(0, 1))(x, w)
    gx_l, gw_l = jax.grad(loss_l, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_l),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_l),
                               atol=1e-4, rtol=1e-4)
