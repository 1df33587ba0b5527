"""Pallas one-hot-matmul augment gather vs the XLA gather path.

The kernel moves exact uint8 values through 0/1 bf16 one-hot weights, so
agreement with the reference gather path is exact (no tolerance).
"""

import numpy as np
import jax
import jax.numpy as jnp

from vfd_gan_tpu.ops.augment import (
    _src_coords,
    augment_clips,
    sample_clip_params,
    staging_size,
)
from vfd_gan_tpu.ops.pallas.augment import augment_gather_pallas

rng = np.random.default_rng(23)


def _coords(b, s, isize, degrees=10.0, seed=0):
    key = jax.random.key(seed)
    angle, crop_y, crop_x, flip = sample_clip_params(key, b, s, isize,
                                                     degrees)
    return jax.vmap(_src_coords, in_axes=(0, 0, 0, 0, None, None))(
        angle, crop_y, crop_x, flip, s, isize)


def _gather_reference(frames, src_x, src_y):
    """Oracle: numpy nearest gather with zero fill."""
    b, t, s, _, c = frames.shape
    isize = src_x.shape[-1]
    out = np.zeros((b, t, isize, isize, c), np.float32)
    for i in range(b):
        sx = np.asarray(src_x[i]).astype(np.int64)
        sy = np.asarray(src_y[i]).astype(np.int64)
        valid = (sx >= 0) & (sx < s) & (sy >= 0) & (sy < s)
        sxc = np.clip(sx, 0, s - 1)
        syc = np.clip(sy, 0, s - 1)
        got = np.asarray(frames[i])[:, syc, sxc, :]      # (T, isize, isize, C)
        out[i] = np.where(valid[None, :, :, None], got, 0)
    return out


def test_pallas_gather_matches_oracle_exactly():
    b, t, isize = 2, 3, 16
    s = staging_size(isize)
    frames = jnp.asarray(rng.integers(0, 256, (b, t, s, s, 3), np.uint8))
    src_x, src_y = _coords(b, s, isize, seed=1)
    got = augment_gather_pallas(frames, src_x, src_y, isize, interpret=True)
    want = _gather_reference(frames, src_x, src_y)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_pallas_gather_zero_angle_is_pure_crop():
    b, t, isize = 1, 2, 8
    s = staging_size(isize)  # 8 -> 8: degenerate staging == isize
    s = max(s, isize + 3)
    frames = jnp.asarray(rng.integers(0, 256, (b, t, s, s, 2), np.uint8))
    # angle 0, crop (1, 2), no flip -> plain slice
    src_x, src_y = jax.vmap(_src_coords, in_axes=(0, 0, 0, 0, None, None))(
        jnp.zeros((1,)), jnp.array([1]), jnp.array([2]), jnp.array([False]),
        s, isize)
    got = augment_gather_pallas(frames, src_x, src_y, isize, interpret=True)
    want = np.asarray(frames)[:, :, 1:1 + isize, 2:2 + isize, :]
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.float32))


def test_pallas_gather_out_of_image_zero_fill():
    b, t, isize = 1, 1, 8
    s = isize + 2
    frames = jnp.asarray(rng.integers(1, 256, (b, t, s, s, 1), np.uint8))
    # shift the crop window far outside the staging image: all zeros
    src_x = jnp.full((b, isize, isize), -5.0, jnp.float32)
    src_y = jnp.full((b, isize, isize), float(s + 7), jnp.float32)
    got = augment_gather_pallas(frames, src_x, src_y, isize, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), 0.0)


def test_augment_clips_pallas_path_matches_gather_path():
    b, t, isize = 2, 2, 16
    s = staging_size(isize)
    key = jax.random.key(7)
    data = jnp.asarray(rng.integers(0, 256, (b, t, s, s, 3), np.uint8))
    real = jnp.asarray(rng.integers(0, 256, (b, t, s, s, 3), np.uint8))
    mask = jnp.asarray(rng.integers(0, 256, (b, t, s, s, 1), np.uint8))
    want = augment_clips(key, data, real, mask, isize, use_pallas=False)
    got = augment_clips(key, data, real, mask, isize, use_pallas=True,
                        interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
