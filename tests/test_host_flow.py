"""Host cv2 flow escape hatch: agreement with the device kernel + jit use."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfd_gan_tpu.ops.flow import video_to_flow_rgb
from vfd_gan_tpu.train.host_flow import (
    host_video_to_flow_rgb,
    video_to_flow_rgb_callback,
)


def _moving_square_video(b=1, t=4, s=48):
    video = np.full((b, t, s, s, 3), -1.0, np.float32)
    for j in range(t):
        video[:, j, 10 + 3 * j:20 + 3 * j, 10:20, :] = 1.0
    return video


def test_host_flow_shape_and_framing():
    v = _moving_square_video()
    out = host_video_to_flow_rgb(v)
    assert out.shape == v.shape
    assert out.min() >= -1.0 and out.max() <= 1.0
    np.testing.assert_array_equal(out[:, -1], out[:, -2])


def test_host_and_device_flow_agree_directionally():
    v = _moving_square_video()
    host = host_video_to_flow_rgb(v)
    dev = np.asarray(video_to_flow_rgb(jnp.asarray(v)))
    # both encode downward motion of the square; compare where either path
    # sees significant signal (value channel large -> saturated colors)
    h_act = np.abs(host[0, 1]).max(axis=-1)
    d_act = np.abs(dev[0, 1]).max(axis=-1)
    mask = (h_act > 0.5) & (d_act > 0.5)
    assert mask.sum() > 20
    cos = np.sum(host[0, 1][mask] * dev[0, 1][mask]) / (
        np.linalg.norm(host[0, 1][mask]) * np.linalg.norm(dev[0, 1][mask])
        + 1e-9)
    assert cos > 0.7


def test_callback_works_under_jit():
    v = jnp.asarray(_moving_square_video())
    out = jax.jit(video_to_flow_rgb_callback)(v)
    np.testing.assert_allclose(np.asarray(out),
                               host_video_to_flow_rgb(np.asarray(v)),
                               atol=1e-6)
