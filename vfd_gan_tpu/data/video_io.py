"""Host-side video decode/encode (cv2) and mask preparation.

Video decode stays on host by nature (SURVEY.md §2.2); everything downstream
of decode (augmentation, normalisation) runs on device.  Reference
equivalents: frame counting lib/data.py:46-52, windowed decode
lib/data.py:92-111, mask invert+Canny lib/data.py:102-105.
"""

from __future__ import annotations

import os

import cv2
import numpy as np


def count_frames(path: str) -> int:
    """Number of frames via container metadata (reference: lib/data.py:46-52)."""
    cap = cv2.VideoCapture(path)
    try:
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()


def mask_edge_frames(frames: np.ndarray) -> np.ndarray:
    """Ground-truth mask prep: invert then Canny(100, 200) edge map.

    The reference's GT is the *edge map* of the inverted mask video — the
    model learns forgery boundaries, not filled regions (lib/data.py:102-105).
    Input ``(T, H, W, 3)`` uint8 RGB; output ``(T, H, W, 1)`` uint8 {0, 255}.
    """
    out = np.empty(frames.shape[:3] + (1,), np.uint8)
    for i, f in enumerate(frames):
        inv = cv2.bitwise_not(f)
        out[i, :, :, 0] = cv2.Canny(inv, 100, 200)
    return out


def read_clip(path: str, first_frame: int, num_frames: int,
              resize_to: tuple[int, int] | None = None,
              mask: bool = False) -> np.ndarray:
    """Decode ``num_frames`` RGB frames starting at ``first_frame``.

    Returns uint8 ``(T, H, W, 3)`` (or ``(T, H, W, 1)`` with ``mask=True``,
    which applies the invert+Canny prep per frame).  ``resize_to=(H, W)``
    resizes each decoded frame on host (bilinear — the staging resize; all
    further geometry happens on device).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(f"video not found: {path}")
    cap = cv2.VideoCapture(path)
    try:
        if first_frame > 0:
            cap.set(cv2.CAP_PROP_POS_FRAMES, first_frame)
        frames = []
        for _ in range(num_frames):
            ret, frame = cap.read()
            if not ret:
                # Ragged tail: repeat the last good frame (the reference
                # would feed None into cvtColor and crash; fail soft here).
                if not frames:
                    raise IOError(f"failed to decode any frame from {path}")
                frames.append(frames[-1].copy())
                continue
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if mask:
                inv = cv2.bitwise_not(rgb)
                rgb = cv2.Canny(inv, 100, 200)[..., None]
            if resize_to is not None:
                interp = cv2.INTER_LINEAR
                rgb = cv2.resize(rgb, (resize_to[1], resize_to[0]),
                                 interpolation=interp)
                if rgb.ndim == 2:
                    rgb = rgb[..., None]
            frames.append(rgb)
        return np.stack(frames)
    finally:
        cap.release()


def write_video(path: str, frames: np.ndarray, fps: int = 10) -> None:
    """Encode uint8 RGB ``(T, H, W, 3)`` frames (mp4v).  Used by the
    synthetic-data generator and tests."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t, h, w = frames.shape[:3]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        raise IOError(f"cannot open video writer for {path}")
    try:
        for f in frames:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    finally:
        writer.release()
