"""On-device transform library vs numpy/torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfd_gan_tpu.ops import transforms as T

rng = np.random.default_rng(41)


def _clip(t=2, h=12, w=12, c=3):
    return jnp.asarray(rng.uniform(0, 1, (t, h, w, c)).astype(np.float32))


def test_center_crop_matches_reference_rounding():
    # reference: x1 = round((w - cw) / 2) (video_transforms.py:239-241)
    x = _clip(h=11, w=11)
    out = T.center_crop(x, (4, 4))
    y0 = int(round((11 - 4) / 2.0))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x)[:, y0:y0 + 4, y0:y0 + 4])


def test_random_crop_bounds_and_shape():
    x = _clip(h=10, w=10)
    for seed in range(5):
        out = T.random_crop(jax.random.key(seed), x, (4, 6))
        assert out.shape == (2, 4, 6, 3)


def test_random_flip_is_bernoulli():
    x = _clip()
    flipped = sum(
        bool(jnp.any(T.random_horizontal_flip(jax.random.key(s), x)
                     != x)) for s in range(20))
    assert 0 < flipped < 20


def test_clip_to_tensor_and_stacked():
    u8 = jnp.asarray(rng.integers(0, 255, (3, 4, 4, 3), dtype=np.uint8))
    t = T.clip_to_tensor(u8)
    assert t.shape == (3, 4, 4, 3) and float(t.max()) <= 1.0
    s = T.to_stacked_tensor(u8)
    assert s.shape == (4, 4, 9)
    np.testing.assert_allclose(np.asarray(s[..., 0:3]),
                               np.asarray(t[0]), atol=1e-6)


def test_normalize_mean_std():
    x = _clip()
    out = T.normalize_mean_std(x, [0.5, 0.5, 0.5], [0.25, 0.25, 0.25])
    np.testing.assert_allclose(np.asarray(out),
                               (np.asarray(x) - 0.5) / 0.25, atol=1e-6)


def test_adjustments_match_torchvision_semantics():
    torch = pytest.importorskip("torch")
    x = _clip(t=1)[0]
    xt = torch.from_numpy(np.asarray(x).transpose(2, 0, 1))

    def tv_blend(img, factor, other):
        return (factor * img + (1 - factor) * other).clamp(0, 1)

    # brightness: blend with zeros
    got = np.asarray(T.adjust_brightness(x, 1.3))
    want = tv_blend(xt, 1.3, torch.zeros_like(xt)).numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # saturation: blend with grayscale
    gray = (0.299 * xt[0] + 0.587 * xt[1] + 0.114 * xt[2])[None]
    got = np.asarray(T.adjust_saturation(x, 0.5))
    want = tv_blend(xt, 0.5, gray).numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # contrast: blend with mean of grayscale
    mean = gray.mean()
    got = np.asarray(T.adjust_contrast(x, 1.5))
    want = tv_blend(xt, 1.5, mean * torch.ones_like(xt)).numpy()
    np.testing.assert_allclose(got, want.transpose(1, 2, 0), atol=1e-5)


def test_hue_roundtrip():
    x = _clip(t=1)[0]
    out = T.adjust_hue(T.adjust_hue(x, 0.25), -0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_color_jitter_runs_and_stays_in_range():
    x = _clip()
    out = T.color_jitter(jax.random.key(0), x, brightness=0.4, contrast=0.4,
                         saturation=0.4, hue=0.2)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
