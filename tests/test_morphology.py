"""Morphological opening vs the cv2 oracle the reference used
(lib/utils.py:139-147)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vfd_gan_tpu.ops import morphology_open

rng = np.random.default_rng(2)


@pytest.mark.parametrize("k", [3, 5])
def test_open_matches_cv2(k):
    cv2 = pytest.importorskip("cv2")
    img = (rng.uniform(size=(16, 16)) > 0.6).astype(np.float32)
    kernel = np.ones((k, k), np.uint8)
    want = cv2.morphologyEx(img, cv2.MORPH_OPEN, kernel)
    x = jnp.asarray(img)[None, None, :, :, None]  # (B=1,T=1,H,W,C=1)
    got = np.asarray(morphology_open(x, k=k))[0, 0, :, :, 0]
    np.testing.assert_array_equal(got, want)


def test_open_removes_specks_keeps_blobs():
    img = np.zeros((20, 20), np.float32)
    img[3, 3] = 1.0                       # lone speck -> removed by 5x5 open
    img[8:16, 8:16] = 1.0                 # 8x8 blob -> survives
    x = jnp.asarray(img)[None, None, :, :, None]
    out = np.asarray(morphology_open(x))[0, 0, :, :, 0]
    assert out[3, 3] == 0.0
    assert out[10:14, 10:14].min() == 1.0
