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


def _mygan_engine(tmp_path, **kw):
    from vfd_gan_tpu.config import Config
    from vfd_gan_tpu.train.gan_engine import MyGanEngine

    base = dict(model="mygan", ep=1, isize=64, nfr=16, batchsize=1, freq=10,
                lr=1e-3, ngf=4, ndf=4, result_root=str(tmp_path),
                compute_dtype="float32", tensorboard=False)
    base.update(kw)
    cfg = Config(**base).validate()
    return MyGanEngine(cfg, train_iter=None, test_iter=None), cfg


def _staged_batch(cfg, seed=0):
    from vfd_gan_tpu.ops.augment import staging_size

    rng = np.random.default_rng(seed)
    s = staging_size(cfg.isize)
    b, t = cfg.batchsize, cfg.nfr
    return {
        "data": rng.integers(0, 255, (b, t, s, s, 3), dtype=np.uint8),
        "real": rng.integers(0, 255, (b, t, s, s, 3), dtype=np.uint8),
        "mask": (rng.integers(0, 2, (b, t, s, s, 1), dtype=np.uint8) * 255),
        "label": np.ones((b, t), np.float32),
    }


def test_mygan_gan_dynamics(tmp_path):
    """GAN-dynamics guard (VERDICT r3 item 7): overfitting one fixed batch
    for 40 alternating G/D steps must (a) drive err_g_con down, (b) keep
    every D loss finite, and (c) keep D off the collapse boundary the
    reference's commented reinit_d trigger guards
    (models/mygannet.py:346-348,367: reinit when err_d falls to ~0)."""
    eng, cfg = _mygan_engine(tmp_path)
    batch = _staged_batch(cfg)
    key = jax.random.key(7)

    g_con, d_err = [], []
    # the fixed augmentation key freezes the crop/flip draw so the batch
    # truly repeats step to step (the overfit premise)
    step_key = jax.random.key(3)
    for _ in range(40):
        eng.g_state, eng.d_state, metrics, _ = eng._train_step(
            eng.g_state, eng.d_state, batch, step_key)
        g_con.append(float(metrics["g/err_g_con/train"]))
        d_err.append(float(metrics["d/err_d/train"]))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, float(v))
    eng.close()

    first, last = np.mean(g_con[:5]), np.mean(g_con[-5:])
    assert last < first * 0.9, (first, last)
    # non-degenerate D throughout: neither collapsed to 0 (the reference's
    # reinit trigger) nor diverged
    assert min(d_err) > 1e-5, min(d_err)
    assert max(d_err) < 50.0, max(d_err)


def test_reinit_d(tmp_path):
    """reinit_d re-randomises D (params change, Adam state resets) and
    leaves G untouched (reference models/mygannet.py:346-348)."""
    eng, cfg = _mygan_engine(tmp_path)
    batch = _staged_batch(cfg)
    # one real step so D's opt-state count is nonzero before the reinit
    eng.g_state, eng.d_state, _, _ = eng._train_step(
        eng.g_state, eng.d_state, batch, jax.random.key(3))

    g_leaf = np.asarray(jax.tree_util.tree_leaves(eng.g_state.params)[0])
    d_leaves = [np.asarray(x).copy()
                for x in jax.tree_util.tree_leaves(eng.d_state.params)]
    count_before = int(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x, eng.d_state.opt_state))[0])

    eng.reinit_d()

    d_after = [np.asarray(x)
               for x in jax.tree_util.tree_leaves(eng.d_state.params)]
    assert any(a.shape == b.shape and not np.allclose(a, b)
               for a, b in zip(d_leaves, d_after))
    # fresh optimizer: step count back to zero
    counts = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        eng.d_state.opt_state) if np.asarray(x).ndim == 0]
    assert all(int(c) == 0 for c in counts), counts
    assert count_before >= 1
    np.testing.assert_array_equal(
        g_leaf, np.asarray(jax.tree_util.tree_leaves(eng.g_state.params)[0]))

    # the re-randomised D still trains: one more step runs finite
    eng.g_state, eng.d_state, metrics, _ = eng._train_step(
        eng.g_state, eng.d_state, batch, jax.random.key(5))
    assert np.isfinite(float(metrics["d/err_d/train"]))
    eng.close()
