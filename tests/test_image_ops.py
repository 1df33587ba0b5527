"""Image/video elementwise ops vs numpy/cv2 oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from vfd_gan_tpu.ops import (
    gray2rgb,
    minmax_normalize,
    rgb_to_gray,
    threshold,
    to_channel_first,
    to_channel_last,
)

rng = np.random.default_rng(1)


def test_minmax_normalize():
    x = rng.normal(size=(2, 4, 4)).astype(np.float32) * 10
    got = np.asarray(minmax_normalize(jnp.asarray(x)))
    want = (x - x.min()) / (x.max() - x.min() + 1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # constant input -> zeros, not NaN (reference +1e-5 quirk)
    c = np.full((3, 3), 7.0, np.float32)
    assert np.all(np.asarray(minmax_normalize(jnp.asarray(c))) == 0)


def test_gray2rgb_roundtrip_layouts():
    x = rng.uniform(size=(2, 3, 4, 4, 1)).astype(np.float32)  # BTHWC
    y = np.asarray(gray2rgb(jnp.asarray(x)))
    assert y.shape == (2, 3, 4, 4, 3)
    np.testing.assert_array_equal(y[..., 0], x[..., 0])
    np.testing.assert_array_equal(y[..., 2], x[..., 0])
    cf = np.asarray(to_channel_first(jnp.asarray(y)))
    assert cf.shape == (2, 3, 3, 4, 4)
    np.testing.assert_array_equal(np.asarray(to_channel_last(jnp.asarray(cf))), y)


def test_rgb_to_gray_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = rng.uniform(0, 1, size=(8, 8, 3)).astype(np.float32)
    want = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    got = np.asarray(rgb_to_gray(jnp.asarray(img)))[..., 0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_threshold_strict_greater():
    x = jnp.asarray(np.array([0.49, 0.5, 0.51], np.float32))
    np.testing.assert_array_equal(np.asarray(threshold(x)), [0.0, 0.0, 1.0])
