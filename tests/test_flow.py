"""Optical-flow kernel: known-translation recovery + cv2 agreement
(documented-tolerance parity, SURVEY.md §7 "hard parts")."""

import numpy as np
import jax.numpy as jnp
import pytest

from vfd_gan_tpu.ops.flow import (
    farneback_flow,
    flow_to_rgb,
    poly_expansion,
    video_to_flow_rgb,
)

rng = np.random.default_rng(21)


def _smooth_image(h, w, seed=0):
    r = np.random.default_rng(seed)
    base = r.normal(size=(h // 4, w // 4))
    img = np.kron(base, np.ones((4, 4)))
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(img, 3.0)
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return (img * 255).astype(np.float32)


def test_poly_expansion_gradients():
    # On a linear ramp f = 3x + 2y, the expansion's linear coefficients
    # should recover the slopes away from borders.
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (3.0 * xx + 2.0 * yy)[None]
    coeffs = np.asarray(poly_expansion(jnp.asarray(img)))
    np.testing.assert_allclose(coeffs[0, 8:-8, 8:-8, 0], 3.0, atol=1e-2)
    np.testing.assert_allclose(coeffs[0, 8:-8, 8:-8, 1], 2.0, atol=1e-2)


@pytest.mark.parametrize("shift", [(3, 0), (0, -2), (2, 2)])
def test_translation_recovered(shift):
    img = _smooth_image(64, 64, seed=1)
    sx, sy = shift
    shifted = np.roll(np.roll(img, sy, axis=0), sx, axis=1)
    flow = np.asarray(farneback_flow(jnp.asarray(img[None]),
                                     jnp.asarray(shifted[None])))[0]
    inner = flow[16:-16, 16:-16]
    # flow points from prev to cur: expected (sx, sy)
    assert abs(np.median(inner[..., 0]) - sx) < 0.5
    assert abs(np.median(inner[..., 1]) - sy) < 0.5


def test_direction_agrees_with_cv2():
    cv2 = pytest.importorskip("cv2")
    img = _smooth_image(64, 64, seed=2)
    shifted = np.roll(img, 3, axis=1)
    want = cv2.calcOpticalFlowFarneback(img.astype(np.uint8),
                                        shifted.astype(np.uint8),
                                        None, 0.5, 3, 15, 3, 5, 1.2, 0)
    got = np.asarray(farneback_flow(jnp.asarray(img[None]),
                                    jnp.asarray(shifted[None])))[0]
    inner = np.s_[16:-16, 16:-16]
    cos = np.sum(want[inner] * got[inner]) / (
        np.linalg.norm(want[inner]) * np.linalg.norm(got[inner]) + 1e-9)
    assert cos > 0.8


def test_flow_to_rgb_encoding():
    # pure +x motion -> hue 0 -> red channel dominant (OpenCV HSV)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 0] = 2.0
    flow[0, 0, 0] = 0.0  # one zero pixel so min-max spread is nonzero
    rgb = np.asarray(flow_to_rgb(jnp.asarray(flow)))[0]
    assert rgb.shape == (8, 8, 3)
    assert rgb[4, 4, 0] > rgb[4, 4, 1] and rgb[4, 4, 0] > rgb[4, 4, 2]


def test_video_to_flow_rgb_shape_and_duplicate_last():
    video = rng.uniform(-1, 1, size=(2, 4, 32, 32, 3)).astype(np.float32)
    out = np.asarray(video_to_flow_rgb(jnp.asarray(video)))
    assert out.shape == (2, 4, 32, 32, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # last flow frame duplicated (lib/utils.py:123-125)
    np.testing.assert_array_equal(out[:, -1], out[:, -2])


def test_streams_normalisation_matches_separate_calls():
    """The reference calls video_to_flow once per video stream
    (models/mygannet.py:281-282), so each stream is min-max stretched on
    its own; ``streams=2`` on a batched call must reproduce exactly the
    two separate single-stream calls.  A binary gt stream batched with a
    narrow-range sigmoid-like stream is the regression case: a joint
    min-max would leave the narrow stream unstretched."""
    b, t, h, w = 2, 4, 32, 32
    gt = (rng.uniform(size=(b, t, h, w, 1)) > 0.5).astype(np.float32)
    gt3 = np.repeat(gt * 2.0 - 1.0, 3, axis=-1)            # binary, [-1, 1]
    pred = rng.uniform(-0.2, 0.2, size=(b, t, h, w, 1)).astype(np.float32)
    pred3 = np.repeat(pred, 3, axis=-1)                     # narrow range

    both = np.concatenate([gt3, pred3], axis=0)
    fused = np.asarray(video_to_flow_rgb(jnp.asarray(both), streams=2))
    sep_gt = np.asarray(video_to_flow_rgb(jnp.asarray(gt3)))
    sep_pred = np.asarray(video_to_flow_rgb(jnp.asarray(pred3)))

    np.testing.assert_allclose(fused[:b], sep_gt, atol=1e-5)
    np.testing.assert_allclose(fused[b:], sep_pred, atol=1e-5)

    # and the joint (streams=1) normalisation is NOT equivalent — guards
    # against silently regressing to the coupled behaviour
    joint = np.asarray(video_to_flow_rgb(jnp.asarray(both)))
    assert np.abs(joint[b:] - sep_pred).max() > 1e-3
