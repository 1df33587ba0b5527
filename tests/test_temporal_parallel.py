"""Frame-axis sequence parallelism: sharded == unsharded (8 fake devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfd_gan_tpu.ops.convs import temporal_conv
from vfd_gan_tpu.parallel.temporal import make_sp_mesh, temporal_conv_sp


@pytest.mark.parametrize("sp", [2, 4])
def test_upsample2x_t_sp_matches_trilinear(sp):
    from vfd_gan_tpu.ops.resize import resize_trilinear
    from vfd_gan_tpu.parallel.temporal import upsample2x_t_sp

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 8, 3, 3, 2)).astype(np.float32))
    want = resize_trilinear(x, (16, 3, 3))
    got = upsample2x_t_sp(x, make_sp_mesh(sp))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("sp", [2, 4])
def test_pool_conv_upsample_chain_sp(sp):
    """Encoder/decoder primitive chain sharded == unsharded."""
    from vfd_gan_tpu.ops.resize import resize_trilinear
    from vfd_gan_tpu.parallel.temporal import (
        avg_pool2x_t_sp,
        temporal_conv_sp,
        upsample2x_t_sp,
    )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 16, 4, 4, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3)).astype(np.float32) * 0.2)
    mesh = make_sp_mesh(sp)

    got = upsample2x_t_sp(
        avg_pool2x_t_sp(temporal_conv_sp(x, k, mesh), mesh), mesh)

    conv = temporal_conv(x, k, padding=1)
    pooled = conv.reshape(1, 8, 2, 4, 4, 3).mean(axis=2)
    want = resize_trilinear(pooled, (16, 4, 4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_temporal_conv_sp_matches_unsharded(sp):
    if len(jax.devices()) < sp:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 16, 4, 4, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 5)).astype(np.float32) * 0.1)

    want = temporal_conv(x, k, padding=1)
    mesh = make_sp_mesh(sp)
    got = temporal_conv_sp(x, k, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
