"""Forward-shape and range tests for the model zoo (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from vfd_gan_tpu.models.mygan import DualDisc, Generator, SpatialDisc, TemporalDisc
from vfd_gan_tpu.models.stcnn import AutoEncoder


def _video(b=1, t=16, s=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, size=(b, t, s, s, c)).astype(np.float32))


def test_generator_mask_shape_and_range():
    x = _video()
    model = Generator(ngf=8)
    vars_ = model.init(jax.random.key(0), x, False)
    y = model.apply(vars_, x, False)
    assert y.shape == (1, 16, 16, 16, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_generator_train_mode_updates_batch_stats_and_uses_dropout():
    x = _video()
    model = Generator(ngf=8)
    vars_ = model.init(jax.random.key(0), x, False)
    y, mut = model.apply(vars_, x, True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.key(1)})
    assert y.shape == (1, 16, 16, 16, 1)
    # running stats must have moved
    old = jax.tree_util.tree_leaves(vars_["batch_stats"])
    new = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_spatial_disc_shapes():
    x = _video(s=64)
    model = SpatialDisc(ndf=4)
    vars_ = model.init(jax.random.key(0), x, False)
    score, feat = model.apply(vars_, x, False)
    assert score.shape == (1,)
    assert feat.shape == (1, 16, 1, 1, 4 * 32)
    assert 0.0 <= float(score[0]) <= 1.0


def test_temporal_disc_shapes():
    x = _video(t=16, s=8)
    model = TemporalDisc(ndf=4)
    vars_ = model.init(jax.random.key(0), x, False)
    score, feat = model.apply(vars_, x, False)
    assert score.shape == (1,)
    assert feat.shape == (1, 2, 8, 8, 16)


def test_dual_disc():
    rgb = _video(s=64)
    flow = _video(s=64, seed=1)
    model = DualDisc(ndf=4)
    vars_ = model.init(jax.random.key(0), rgb, flow, False)
    s_cls, s_feat, t_cls, t_feat = model.apply(vars_, rgb, flow, False)
    assert s_cls.shape == t_cls.shape == (1,)


def test_autoencoder_shape():
    x = _video()
    model = AutoEncoder()
    vars_ = model.init(jax.random.key(0), x, False)
    y = model.apply(vars_, x, False)
    assert y.shape == (1, 16, 16, 16, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
