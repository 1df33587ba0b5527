"""Remat generator: identical forward/gradients, rematerialised backward."""

import jax
import jax.numpy as jnp
import numpy as np

from vfd_gan_tpu.models.mygan import Generator


def test_remat_matches_plain_gradients():
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, 16, 16, 16, 3)).astype(np.float32))
    gt = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)

    plain = Generator(ngf=4)
    rem = Generator(ngf=4, remat=True)
    variables = plain.init(jax.random.key(0), x, False)

    def loss(model, params):
        pred, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)})
        return jnp.mean((pred - gt) ** 2)

    g_plain = jax.grad(lambda p: loss(plain, p))(variables["params"])
    g_rem = jax.grad(lambda p: loss(rem, p))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_rem)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_selective_remat_matches_plain_gradients():
    """remat_blocks=('dconv1','uconv1'): only the full-res levels
    rematerialise (the bandwidth-motivated selective trade, VERDICT r4
    item 2) — gradients identical to the plain generator."""
    x = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, (1, 16, 16, 16, 3)).astype(np.float32))
    gt = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)

    plain = Generator(ngf=4)
    rem = Generator(ngf=4, remat=True, remat_blocks=("dconv1", "uconv1"))
    variables = plain.init(jax.random.key(0), x, False)

    def loss(model, params):
        pred, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)})
        return jnp.mean((pred - gt) ** 2)

    g_plain = jax.grad(lambda p: loss(plain, p))(variables["params"])
    g_rem = jax.grad(lambda p: loss(rem, p))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_rem)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
