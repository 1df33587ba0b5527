"""Learning-dynamics guards: losses must decrease on a fixed batch.

Shape tests can't catch sign errors in losses/updates; overfitting a single
small batch for a few dozen steps can.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vfd_gan_tpu.models.convlstm import ConvLSTMModel
from vfd_gan_tpu.ops.losses import bce, weighted_bce
from vfd_gan_tpu.train.state import NetState, make_adam


def _overfit(model, x, gt, loss_fn, steps=40, lr=1e-2):
    variables = model.init({"params": jax.random.key(0)}, x, False)
    tx = make_adam(lr, 0.5)
    state = NetState.create(variables, tx)

    @jax.jit
    def step(state):
        def f(params):
            pred, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, True, mutable=["batch_stats"])
            return loss_fn(pred, gt), mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(f, has_aux=True)(
            state.params)
        return state.apply_grads(tx, grads, stats), loss

    first = None
    for _ in range(steps):
        state, loss = step(state)
        if first is None:
            first = float(loss)
    return first, float(loss)


def test_supervised_bce_decreases():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 4, 12, 12, 3)).astype(np.float32))
    gt = jnp.asarray((rng.uniform(size=(2, 4, 12, 12, 1)) > 0.8)
                     .astype(np.float32))
    first, last = _overfit(ConvLSTMModel(), x, gt, bce)
    assert last < first * 0.9, (first, last)


def test_weighted_bce_decreases():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 4, 12, 12, 3)).astype(np.float32))
    gt = jnp.asarray((rng.uniform(size=(2, 4, 12, 12, 1)) > 0.8)
                     .astype(np.float32))
    first, last = _overfit(ConvLSTMModel(), x, gt,
                           lambda p, t: weighted_bce(p, t))
    assert last < first * 0.9, (first, last)
