"""On-device augmentation vs the PIL-based reference pipeline semantics."""

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vfd_gan_tpu.ops.augment import (
    _warp_clip,
    augment_clips,
    normalize_clips,
    staging_size,
)

rng = np.random.default_rng(11)


def test_staging_size():
    assert staging_size(128) == 140  # int(128 * 1.1), lib/data.py:124


def test_rotation_matches_pil_nearest():
    # PIL.Image.rotate(angle) with default NEAREST resample
    # (video_transforms.py:194 PIL branch)
    img = rng.integers(0, 255, (33, 33, 3), dtype=np.uint8)
    for angle in (7.3, -9.9):
        want = np.array(Image.fromarray(img).rotate(angle))
        got = np.asarray(_warp_clip(
            jnp.asarray(img)[None], jnp.deg2rad(angle).astype(np.float32),
            jnp.asarray(0), jnp.asarray(0), jnp.asarray(False), 33))[0]
        assert (got == want).mean() > 0.995  # bit-exact up to fp rounding ties


def test_crop_and_flip():
    img = rng.integers(0, 255, (10, 10, 1), dtype=np.uint8)
    got = np.asarray(_warp_clip(jnp.asarray(img)[None], jnp.asarray(0.0),
                                jnp.asarray(2), jnp.asarray(3),
                                jnp.asarray(False), 4))[0]
    np.testing.assert_array_equal(got, img[2:6, 3:7])
    flipped = np.asarray(_warp_clip(jnp.asarray(img)[None], jnp.asarray(0.0),
                                    jnp.asarray(2), jnp.asarray(3),
                                    jnp.asarray(True), 4))[0]
    np.testing.assert_array_equal(flipped, img[2:6, 3:7][:, ::-1])


def test_augment_joint_and_ranges():
    b, t, isize = 2, 3, 16
    s = staging_size(isize)
    data = rng.integers(0, 255, (b, t, s, s, 3), dtype=np.uint8)
    mask = rng.integers(0, 2, (b, t, s, s, 1), dtype=np.uint8) * 255
    d, r, m = augment_clips(jax.random.key(0), jnp.asarray(data),
                            jnp.asarray(data), jnp.asarray(mask), isize)
    assert d.shape == (b, t, isize, isize, 3)
    assert m.shape == (b, t, isize, isize, 1)
    # identical input streams get identical augmentation (shared draw,
    # lib/data.py:63-67)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(r))
    assert float(d.min()) >= -1.0 and float(d.max()) <= 1.0
    assert float(m.min()) >= 0.0 and float(m.max()) <= 1.0
    # frames within one clip share the transform: warp commutes with
    # frame-constant inputs
    const = np.broadcast_to(data[:, :1], data.shape).copy()
    d2, _, _ = augment_clips(jax.random.key(0), jnp.asarray(const),
                             jnp.asarray(const), jnp.asarray(mask), isize)
    np.testing.assert_array_equal(np.asarray(d2[0, 0]), np.asarray(d2[0, 1]))


def test_normalize_clips():
    data = np.full((1, 2, 4, 4, 3), 255, np.uint8)
    mask = np.full((1, 2, 4, 4, 1), 255, np.uint8)
    d, r, m = normalize_clips(jnp.asarray(data), jnp.asarray(data),
                              jnp.asarray(mask))
    assert float(d.max()) == 1.0 and float(m.max()) == 1.0
    zero = np.zeros_like(data)
    d0, _, _ = normalize_clips(jnp.asarray(zero), jnp.asarray(zero),
                               jnp.asarray(mask))
    assert float(d0.min()) == -1.0
