"""On-device Canny-style edge detection.

The reference prepares ground-truth masks on host with
``cv2.Canny(invert(frame), 100, 200)`` during decode (lib/data.py:102-105);
the host path keeps that exact behaviour (data/video_io.py).  This module
is the on-device equivalent (SURVEY.md §2.2 "Canny edge + bitwise-not")
for pipelines that keep raw mask frames on device: 5x5 Gaussian smoothing,
Sobel gradients, quantised-direction non-maximum suppression and
double-threshold hysteresis via a fixed number of propagation steps
(``lax.fori_loop`` of 3x3 max-dilations) — all jit/vmap friendly.

cv2 uses the same structure; outputs agree on clean synthetic masks but
bit-parity on natural images is not claimed (cv2's L1 gradient default and
unbounded hysteresis BFS differ).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from vfd_gan_tpu.ops.morphology import dilate

_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)
_GAUSS5 = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]).astype(np.float32) / 256


def _conv2(img, kernel):
    """(N, H, W) correlation with replicate padding."""
    k = kernel.shape[0]
    r = k // 2
    x = jnp.pad(img, ((0, 0), (r, r), (r, r)), mode="edge")[..., None]
    return lax.conv_general_dilated(
        x, jnp.asarray(kernel)[..., None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]


def canny_edges(img: jnp.ndarray, low: float = 100.0, high: float = 200.0,
                hysteresis_iters: int = 3) -> jnp.ndarray:
    """Edge map of grayscale images ``(N, H, W)`` in [0, 255].

    Returns float {0, 1} maps (multiply by 255 for the reference's uint8
    convention).
    """
    smooth = _conv2(img.astype(jnp.float32), _GAUSS5)
    gx = _conv2(smooth, _SOBEL_X)
    gy = _conv2(smooth, _SOBEL_Y)
    mag = jnp.abs(gx) + jnp.abs(gy)          # cv2 default L1 norm

    # quantise gradient direction to {0, 45, 90, 135} degrees
    ang = jnp.rad2deg(jnp.arctan2(gy, gx)) % 180.0
    sector = ((ang + 22.5) // 45).astype(jnp.int32) % 4

    def shift(a, dy, dx):
        return jnp.roll(jnp.roll(a, dy, axis=1), dx, axis=2)

    neighbours = [
        (shift(mag, 0, 1), shift(mag, 0, -1)),      # 0 deg: left/right
        (shift(mag, 1, -1), shift(mag, -1, 1)),     # 45 deg
        (shift(mag, 1, 0), shift(mag, -1, 0)),      # 90 deg: up/down
        (shift(mag, 1, 1), shift(mag, -1, -1)),     # 135 deg
    ]
    n1 = jnp.select([sector == i for i in range(4)],
                    [n[0] for n in neighbours])
    n2 = jnp.select([sector == i for i in range(4)],
                    [n[1] for n in neighbours])
    # strict on one side breaks plateau ties (keeps 1px edges like cv2)
    is_max = (mag > n1) & (mag >= n2)

    strong = is_max & (mag > high)
    weak = is_max & (mag > low)

    def propagate(_, s):
        grown = dilate(s[..., None], k=3, spatial_axes=(1, 2))[..., 0]
        return jnp.where(weak, jnp.maximum(s, grown), s)

    edges = lax.fori_loop(0, hysteresis_iters, propagate,
                          strong.astype(jnp.float32))
    return (edges > 0).astype(jnp.float32)


def mask_edge_frames_device(mask_rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """Device equivalent of the host mask prep (lib/data.py:102-105):
    invert uint8 RGB frames ``(..., H, W, 3)``, grayscale, Canny(100, 200).
    Returns float {0, 1} maps ``(..., H, W)``."""
    inv = (255 - mask_rgb_u8).astype(jnp.float32)
    gray = (0.299 * inv[..., 0] + 0.587 * inv[..., 1] + 0.114 * inv[..., 2])
    shape = gray.shape
    flat = gray.reshape((-1,) + shape[-2:])
    return canny_edges(flat).reshape(shape)
