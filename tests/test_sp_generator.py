"""Sequence-parallel Generator forward == unsharded Generator.apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfd_gan_tpu.models.mygan import Generator
from vfd_gan_tpu.parallel.sp_generator import generator_forward_sp
from vfd_gan_tpu.parallel.temporal import make_sp_mesh


@pytest.mark.parametrize("sp", [2])
def test_sp_generator_matches_unsharded(sp):
    if len(jax.devices()) < sp:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(9)
    # nfr = 16*sp so the bottleneck keeps one frame per shard
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16 * sp, 16, 16, 3))
                    .astype(np.float32))
    model = Generator(ngf=4)
    variables = model.init(jax.random.key(0), x, False)

    want = model.apply(variables, x, False)
    got = generator_forward_sp(jax.device_get(variables), x,
                               make_sp_mesh(sp))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sp_generator_is_differentiable():
    """Gradients flow through the sharded forward (halo ppermutes and the
    SP upsample are transparent to jax.grad) and match the unsharded
    model's input gradients."""
    if len(jax.devices()) < 2:
        pytest.skip("need 2 devices")
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 16, 16, 3))
                    .astype(np.float32))
    model = Generator(ngf=4)
    variables = jax.device_get(model.init(jax.random.key(0), x, False))
    mesh = make_sp_mesh(2)

    g_sp = jax.grad(lambda v: jnp.sum(
        generator_forward_sp({"params": v,
                              "batch_stats": variables["batch_stats"]},
                             x, mesh) ** 2))(variables["params"])
    g_ref = jax.grad(lambda v: jnp.sum(model.apply(
        {"params": v, "batch_stats": variables["batch_stats"]},
        x, False) ** 2))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
