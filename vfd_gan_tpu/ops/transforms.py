"""On-device clip transform library — full videotransforms inventory.

The training/eval pipelines use the fused path in
:mod:`vfd_gan_tpu.ops.augment`; this module completes the reference's
preprocessing component inventory (SURVEY.md C12,
videotransforms/video_transforms.py:15-332, tensor_transforms.py,
stack_transforms.py) as composable on-device ops over channel-last clips
``(T, H, W, C)`` (or batches ``(B, T, H, W, C)``).

All geometry is deterministic given the ``key`` argument — randomness is
explicit, one draw per clip, matching the reference's one-transform-per-clip
semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vfd_gan_tpu.ops.resize import resize_bilinear


def resize(clip, size: tuple[int, int]):
    """Resize (H, W) (video_transforms.Resize, :91-110)."""
    return resize_bilinear(clip, size)


def random_resize(key, clip, ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """Uniform scale draw in ``ratio``; resizes to the scaled size at trace
    time is impossible under jit, so the scale is applied as a resampling of
    the same output grid (video_transforms.RandomResize, :59-88 semantics on
    a fixed canvas)."""
    h, w = clip.shape[-3], clip.shape[-2]
    scale = jax.random.uniform(key, (), minval=ratio[0], maxval=ratio[1])
    # sample the clip at a scaled grid about the origin (reference resizes
    # the canvas; under jit we keep the canvas static)
    ys = jnp.clip(jnp.arange(h) / scale, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) / scale, 0, w - 1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    return clip[..., y0, :, :][..., :, x0, :]


def center_crop(clip, size: tuple[int, int]):
    """(video_transforms.CenterCrop, :204-247): round-half-up corner."""
    h, w = clip.shape[-3], clip.shape[-2]
    ch, cw = size
    y0 = int(round((h - ch) / 2.0))
    x0 = int(round((w - cw) / 2.0))
    return clip[..., y0:y0 + ch, x0:x0 + cw, :]


def random_crop(key, clip, size: tuple[int, int]):
    """(video_transforms.RandomCrop, :113-156): inclusive randint corner."""
    h, w = clip.shape[-3], clip.shape[-2]
    ch, cw = size
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, h - ch + 1)
    x0 = jax.random.randint(kx, (), 0, w - cw + 1)
    start = [0] * (clip.ndim - 3) + [y0, x0, 0]
    return jax.lax.dynamic_slice(
        clip, start, clip.shape[:-3] + (ch, cw, clip.shape[-1]))


def random_horizontal_flip(key, clip, p: float = 0.5):
    """(video_transforms.RandomHorizontalFlip, :32-56)."""
    flip = jax.random.bernoulli(key, p)
    return jnp.where(flip, jnp.flip(clip, axis=-2), clip)


# ---- ColorJitter (video_transforms.ColorJitter, :250-332) -----------------

def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(mx == r, ((g - b) / safe) % 6.0,
                  jnp.where(mx == g, (b - r) / safe + 2.0,
                            (r - g) / safe + 4.0))
    h = jnp.where(d == 0, 0.0, h) / 6.0
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_brightness(clip, factor):
    return jnp.clip(clip * factor, 0.0, 1.0)


def adjust_contrast(clip, factor):
    # torchvision semantics: blend with the mean grayscale
    gray = (0.299 * clip[..., 0] + 0.587 * clip[..., 1]
            + 0.114 * clip[..., 2])
    mean = jnp.mean(gray, axis=(-2, -1), keepdims=True)[..., None]
    return jnp.clip((clip - mean) * factor + mean, 0.0, 1.0)


def adjust_saturation(clip, factor):
    gray = (0.299 * clip[..., 0] + 0.587 * clip[..., 1]
            + 0.114 * clip[..., 2])[..., None]
    return jnp.clip((clip - gray) * factor + gray, 0.0, 1.0)


def adjust_hue(clip, delta):
    hsv = _rgb_to_hsv(jnp.clip(clip, 0.0, 1.0))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + delta) % 1.0)
    return _hsv_to_rgb(hsv)


def color_jitter(key, clip, brightness=0.0, contrast=0.0, saturation=0.0,
                 hue=0.0):
    """Random brightness/contrast/saturation/hue, one draw per clip,
    applied in a random order like the reference (:302-317).  Input in
    [0, 1]."""
    keys = jax.random.split(key, 5)
    b = jax.random.uniform(keys[0], (), minval=max(0, 1 - brightness),
                           maxval=1 + brightness) if brightness > 0 else 1.0
    c = jax.random.uniform(keys[1], (), minval=max(0, 1 - contrast),
                           maxval=1 + contrast) if contrast > 0 else 1.0
    s = jax.random.uniform(keys[2], (), minval=max(0, 1 - saturation),
                           maxval=1 + saturation) if saturation > 0 else 1.0
    h = jax.random.uniform(keys[3], (), minval=-hue,
                           maxval=hue) if hue > 0 else 0.0

    ops = [lambda x: adjust_brightness(x, b),
           lambda x: adjust_saturation(x, s),
           lambda x: adjust_hue(x, h),
           lambda x: adjust_contrast(x, c)]
    order = jax.random.permutation(keys[4], 4)
    for slot in range(4):
        clip = jax.lax.switch(order[slot], ops, clip)
    return clip


# ---- Tensor utilities -----------------------------------------------------

def clip_to_tensor(frames_u8, channel_nb: int = 3, div_255: bool = True):
    """uint8 ``(T, H, W, C)`` -> float ``(T, H, W, C)`` in [0, 1]
    (volume_transforms.ClipToTensor semantics in channel-last layout,
    volume_transforms.py:8-59)."""
    assert frames_u8.shape[-1] == channel_nb, (
        f"expected {channel_nb} channels, got {frames_u8.shape[-1]}")
    x = frames_u8.astype(jnp.float32)
    return x / 255.0 if div_255 else x


def to_stacked_tensor(frames_u8, div_255: bool = True):
    """uint8 ``(T, H, W, C)`` -> float ``(H, W, T*C)`` — the channel-stacked
    alternative layout (stack_transforms.ToStackedTensor, :8-49)."""
    t, h, w, c = frames_u8.shape
    x = frames_u8.astype(jnp.float32)
    if div_255:
        x = x / 255.0
    return jnp.moveaxis(x, 0, 2).reshape(h, w, t * c)


def normalize_mean_std(clip, mean, std):
    """Per-channel standardisation (tensor_transforms.Normalize, :6-28)."""
    mean = jnp.asarray(mean, clip.dtype)
    std = jnp.asarray(std, clip.dtype)
    return (clip - mean) / std


def spatial_random_crop(key, volume, size: tuple[int, int]):
    """Random spatial crop of a ``(T, H, W, C)`` volume
    (tensor_transforms.SpatialRandomCrop, :31-59 — without its ``x1+h``
    slice bug)."""
    return random_crop(key, volume, size)
