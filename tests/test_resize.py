"""Separable matmul resampling vs torch trilinear align_corners=True."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from vfd_gan_tpu.ops.resize import resize_bilinear, resize_trilinear, upsample2x  # noqa: E402

rng = np.random.default_rng(4)


@pytest.mark.parametrize("scale", [(2, 2, 2), (1, 2, 2)])
def test_upsample_matches_torch_align_corners(scale):
    x = rng.normal(size=(2, 3, 5, 5, 4)).astype(np.float32)
    got = np.asarray(upsample2x(jnp.asarray(x), scale))
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    want = F.interpolate(xt, scale_factor=scale, mode="trilinear",
                         align_corners=True).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 4, 1)), atol=1e-5)


def test_downsize_matches_torch_align_corners():
    x = rng.normal(size=(1, 8, 12, 12, 2)).astype(np.float32)
    got = np.asarray(resize_trilinear(jnp.asarray(x), (4, 6, 6)))
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    want = F.interpolate(xt, size=(4, 6, 6), mode="trilinear",
                         align_corners=True).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 4, 1)), atol=1e-5)


def test_bilinear_half_pixel_matches_torch():
    x = rng.normal(size=(2, 9, 9, 3)).astype(np.float32)  # (T,H,W,C) frames
    got = np.asarray(resize_bilinear(jnp.asarray(x), (5, 7)))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = F.interpolate(xt, size=(5, 7), mode="bilinear",
                         align_corners=False).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), atol=1e-5)
