"""Separable linear resampling as matrix products (MXU-friendly).

The reference decoders upsample with ``nn.Upsample(mode='trilinear',
align_corners=True)`` (models/mygannet.py:50, mystcnn.py:20, xception.py:81).
Instead of gather-based interpolation, we build one static ``(out, in)``
interpolation matrix per resized axis and contract with it — three small
matmuls that XLA fuses and the MXU executes, with no dynamic indexing.

``align_corners=True`` sampling grid: ``src = i * (in-1)/(out-1)``.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _linear_matrix(n_in: int, n_out: int, align_corners: bool = True) -> np.ndarray:
    """Dense ``(n_out, n_in)`` linear-interpolation matrix (float32)."""
    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    for i in range(n_out):
        if align_corners:
            src = i * (n_in - 1) / (n_out - 1)
        else:
            src = max(0.0, min(n_in - 1.0, (i + 0.5) * n_in / n_out - 0.5))
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


def _resize_axis(x: jnp.ndarray, axis: int, n_out: int, align_corners: bool) -> jnp.ndarray:
    n_in = x.shape[axis]
    if n_in == n_out:
        return x
    w = jnp.asarray(_linear_matrix(n_in, n_out, align_corners), x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum("...i,oi->...o", moved, w)
    return jnp.moveaxis(out, -1, axis)


def resize_trilinear(x: jnp.ndarray, size: tuple[int, int, int],
                     align_corners: bool = True) -> jnp.ndarray:
    """Resize ``(B, T, H, W, C)`` to ``size=(T', H', W')``.

    ``align_corners=True`` matches torch's trilinear Upsample as used in every
    reference decoder.
    """
    x = _resize_axis(x, 1, size[0], align_corners)
    x = _resize_axis(x, 2, size[1], align_corners)
    x = _resize_axis(x, 3, size[2], align_corners)
    return x


def upsample2x(x: jnp.ndarray, scale: tuple[int, int, int] = (2, 2, 2),
               align_corners: bool = True) -> jnp.ndarray:
    """``nn.Upsample(scale_factor=scale, mode='trilinear')`` equivalent."""
    _, t, h, w, _ = x.shape
    return resize_trilinear(x, (t * scale[0], h * scale[1], w * scale[2]),
                            align_corners)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Per-frame spatial resize of ``(..., H, W, C)`` to ``(H', W')``.

    ``align_corners=False`` gives half-pixel-center sampling (cv2/PIL-style
    without antialiasing), used by the on-device data pipeline.
    """
    x = _resize_axis(x, x.ndim - 3, size[0], align_corners)
    x = _resize_axis(x, x.ndim - 2, size[1], align_corners)
    return x
