"""Forward-shape tests for the remaining model families (small shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from vfd_gan_tpu.models import (
    AnoDiscriminator,
    AnoGenerator,
    ConvLSTMModel,
    GanomalyDiscriminator,
    GanomalyGenerator,
    Xception3D,
    ganomaly_anomaly_score,
)

rng = np.random.default_rng(7)


def _video(b=1, t=8, s=32, c=3):
    return jnp.asarray(rng.uniform(-1, 1, size=(b, t, s, s, c)).astype(np.float32))


def test_xception3d_shape():
    x = _video(t=2, s=32)
    m = Xception3D()
    v = m.init(jax.random.key(0), x, False)
    y = m.apply(v, x, False)
    # stem stride2 + three stride-2 blocks = /16 spatial; decoder x16 back.
    assert y.shape == (1, 2, 32, 32, 1)
    assert 0.0 <= float(y.min()) and float(y.max()) <= 1.0


def test_convlstm_shape_and_recurrence():
    x = _video(t=5, s=8)
    m = ConvLSTMModel()
    v = m.init(jax.random.key(0), x, False)
    y = m.apply(v, x, False)
    assert y.shape == (1, 5, 8, 8, 1)
    # causal state: changing a late frame must not affect early outputs
    x2 = x.at[:, -1].set(0.0)
    y2 = m.apply(v, x2, False)
    np.testing.assert_allclose(np.asarray(y[:, :2]), np.asarray(y2[:, :2]),
                               atol=1e-6)


def test_anogan_generator_shape():
    z = jnp.asarray(rng.normal(size=(2, 100)).astype(np.float32))
    m = AnoGenerator(nfr=8, isize=32)
    v = m.init(jax.random.key(0), z, False)
    y = m.apply(v, z, False)
    assert y.shape == (2, 8, 32, 32, 3)
    assert 0.0 <= float(y.min()) and float(y.max()) <= 1.0


def test_anogan_discriminator_shape():
    x = _video(b=2, t=8, s=32)
    m = AnoDiscriminator()
    v = m.init(jax.random.key(0), x, False)
    score, feat = m.apply(v, x, False)
    assert score.shape == (2,)
    assert feat.shape == (2, 256 * 1 * 4 * 4)


def test_ganomaly_shapes_and_score():
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32))
    g = GanomalyGenerator(isize=32, nz=16, ngf=16)
    v = g.init(jax.random.key(0), x, False)
    fake, z_in, z_out = g.apply(v, x, False)
    assert fake.shape == x.shape
    assert z_in.shape == z_out.shape == (2, 16)
    s = ganomaly_anomaly_score(z_in, z_out)
    assert s.shape == (2,)
    assert float(s.min()) >= 0.0

    d = GanomalyDiscriminator(isize=32, ngf=16)
    dv = d.init(jax.random.key(1), x, False)
    score, feat = d.apply(dv, x, False)
    assert score.shape == (2,)
    assert feat.shape[0] == 2
