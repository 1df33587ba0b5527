"""Elementwise image/video utilities (device-side).

Reference equivalents: lib/utils.py:81-92 (normalize, gray2rgb),
lib/utils.py:131-136 (rgb_to_gray), lib/utils.py:149-152 (threshold).
The reference round-trips several of these through CPU/cv2; here they are all
pure jnp and fuse into surrounding computation under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

# ITU-R BT.601 luma weights — what cv2.cvtColor(RGB2GRAY) uses
# (reference call sites: lib/utils.py:108,134).
_LUMA = (0.299, 0.587, 0.114)


def minmax_normalize(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Shift/scale to [0, 1) by global (or per-axis) min/max.

    Matches reference ``normalize`` (lib/utils.py:81-89) including the +1e-5
    in the denominator (so a constant input maps to 0, not NaN).
    """
    mn = jnp.min(x, axis=axis, keepdims=axis is not None)
    mx = jnp.max(x, axis=axis, keepdims=axis is not None)
    return (x - mn) / (mx - mn + 1e-5)


def gray2rgb(video: jnp.ndarray) -> jnp.ndarray:
    """Repeat a single channel to 3 (reference: lib/utils.py:91-92).

    Expects channel-last input ``(..., 1)``; returns ``(..., 3)``.
    """
    return jnp.concatenate([video, video, video], axis=-1)


def rgb_to_gray(video: jnp.ndarray) -> jnp.ndarray:
    """BT.601 luma; channel-last ``(..., 3) -> (..., 1)``.

    Matches cv2.cvtColor(RGB2GRAY) as used by reference lib/utils.py:131-136.
    """
    r, g, b = video[..., 0], video[..., 1], video[..., 2]
    return (_LUMA[0] * r + _LUMA[1] * g + _LUMA[2] * b)[..., None]


def threshold(x: jnp.ndarray, t: float = 0.5) -> jnp.ndarray:
    """Binarise at ``t`` (reference: lib/utils.py:149-152; strict >)."""
    return (x > t).astype(x.dtype)


def to_channel_last(x: jnp.ndarray) -> jnp.ndarray:
    """torch layout ``(B, C, T, H, W)`` -> framework layout ``(B, T, H, W, C)``."""
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def to_channel_first(x: jnp.ndarray) -> jnp.ndarray:
    """Framework layout ``(B, T, H, W, C)`` -> torch layout ``(B, C, T, H, W)``."""
    return jnp.transpose(x, (0, 4, 1, 2, 3))
