"""Host cv2 optical-flow escape hatch for parity audits.

``--host_flow`` swaps the on-device Farneback-equivalent for genuine
``cv2.calcOpticalFlowFarneback`` executed on host via ``jax.pure_callback``
inside the jitted step — the audit path SURVEY.md §7 calls for.  The
encoding mirrors the device path (and the reference's intent,
lib/utils.py:94-129): grayscale from per-time-slab-normalised video, flow
per consecutive pair, hue = angle_deg/2, sat max, value = per-frame min-max
magnitude, last flow frame duplicated, output RGB in [-1, 1].
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def host_video_to_flow_rgb(video: np.ndarray, streams: int = 1) -> np.ndarray:
    """numpy RGB video ``(B, T, H, W, 3)`` in [-1, 1] -> flow RGB video.

    ``streams``: number of contiguous batch groups to min-max normalise
    independently (the reference calls video_to_flow once per video stream,
    models/mygannet.py:281-282 — see ops/flow.video_to_flow_rgb).
    """
    import cv2

    video = np.asarray(video, np.float32)
    b, t, h, w, _ = video.shape
    # per-time-slab min-max normalisation across one stream's batch
    # (lib/utils.py:96)
    assert b % streams == 0, (b, streams)
    g = b // streams
    norm = np.empty_like(video)
    for s in range(streams):
        for j in range(t):
            slab = video[s * g:(s + 1) * g, j]
            lo, hi = slab.min(), slab.max()
            norm[s * g:(s + 1) * g, j] = (slab - lo) / (hi - lo + 1e-5)
    gray = (norm[..., 0] * 0.299 + norm[..., 1] * 0.587
            + norm[..., 2] * 0.114) * 255.0
    gray = gray.astype(np.uint8)

    out = np.zeros((b, t, h, w, 3), np.float32)
    for i in range(b):
        for j in range(1, t):
            flow = cv2.calcOpticalFlowFarneback(
                gray[i, j - 1], gray[i, j], None, 0.5, 3, 15, 3, 5, 1.2, 0)
            mag, ang = cv2.cartToPolar(flow[..., 0], flow[..., 1],
                                       angleInDegrees=True)
            hsv = np.zeros((h, w, 3), np.uint8)
            hsv[..., 0] = (ang / 2).astype(np.uint8)
            hsv[..., 1] = 255
            hsv[..., 2] = cv2.normalize(mag, None, 0, 255,
                                        cv2.NORM_MINMAX).astype(np.uint8)
            out[i, j - 1] = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB) / 255.0
        out[i, t - 1] = out[i, t - 2]          # duplicate last flow frame
    return out * 2.0 - 1.0


def video_to_flow_rgb_callback(video: jnp.ndarray,
                               streams: int = 1) -> jnp.ndarray:
    """jit-compatible wrapper: runs the cv2 path on host."""
    shape = jax.ShapeDtypeStruct(video.shape, jnp.float32)
    return jax.pure_callback(
        lambda v: host_video_to_flow_rgb(np.asarray(v), streams), shape,
        video, vmap_method="sequential")
