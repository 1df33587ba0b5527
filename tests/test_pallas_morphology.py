"""Pallas opening kernel (interpret mode on CPU) vs lax and cv2 oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from vfd_gan_tpu.ops.morphology import morphology_open
from vfd_gan_tpu.ops.pallas.morphology import morphology_open_pallas

rng = np.random.default_rng(31)


@pytest.mark.parametrize("k", [3, 5])
def test_pallas_open_matches_lax(k):
    x = (rng.uniform(size=(2, 3, 16, 16)) > 0.5).astype(np.float32)
    want = np.asarray(morphology_open(
        jnp.asarray(x)[..., None], k=k))[..., 0]
    got = np.asarray(morphology_open_pallas(jnp.asarray(x), k=k,
                                            interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_open_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = (rng.uniform(size=(20, 24)) > 0.6).astype(np.float32)
    want = cv2.morphologyEx(img, cv2.MORPH_OPEN, np.ones((5, 5), np.uint8))
    got = np.asarray(morphology_open_pallas(jnp.asarray(img)[None],
                                            interpret=True))[0]
    np.testing.assert_array_equal(got, want)
