"""Frame-axis sequence parallelism: sharded == unsharded (8 fake devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfd_gan_tpu.ops.convs import temporal_conv
from vfd_gan_tpu.parallel.temporal import make_sp_mesh, temporal_conv_sp


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
