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


def test_host_and_device_flow_agree_on_motion():
    # compare the recovered flow *fields* (the HSV-encoded colors are
    # hypersensitive to hue near zero magnitude and not a stable metric)
    cv2 = pytest.importorskip("cv2")
    from vfd_gan_tpu.ops.flow import farneback_flow

    v = _moving_square_video()
    gray = ((v[..., 0] * 0.299 + v[..., 1] * 0.587 + v[..., 2] * 0.114)
            + 1.0) / 2.0 * 255.0
    dev = np.asarray(farneback_flow(jnp.asarray(gray[0, 1:2]),
                                    jnp.asarray(gray[0, 2:3])))[0]
    host = cv2.calcOpticalFlowFarneback(gray[0, 1].astype(np.uint8),
                                        gray[0, 2].astype(np.uint8),
                                        None, 0.5, 3, 15, 3, 5, 1.2, 0)
    # the square moves 3px in +y per frame; both must recover it inside
    region = np.s_[13:23, 10:20]
    np.testing.assert_allclose(dev[region].mean(axis=(0, 1)),
                               host[region].mean(axis=(0, 1)), atol=0.3)
    np.testing.assert_allclose(dev[region].mean(axis=(0, 1)), [0.0, 3.0],
                               atol=0.3)


def test_callback_works_under_jit():
    v = jnp.asarray(_moving_square_video())
    out = jax.jit(video_to_flow_rgb_callback)(v)
    np.testing.assert_allclose(np.asarray(out),
                               host_video_to_flow_rgb(np.asarray(v)),
                               atol=1e-6)
