"""Run directories + TensorBoard observability.

Mirrors the reference's observability surface (SURVEY.md §5): run dir
``result_root/model/b{B}xd{nfr}xwh{isize}_.../{timestamp}`` with ``weights/``
and ``runs/`` subdirectories and an ``args.txt`` JSON dump
(lib/train_gan.py:33-50); every ``freq`` steps the engines flush tiled video
grids, nested scalars (``add_scalars`` on the tag's head with the tail as
series — lib/utils.py:36-39), plain scores, and optional histograms
(lib/utils.py:24-48, minus its ``self`` bug).

Videos arrive channel-last ``(B, T, H, W, C)``; grids tile the batch along
width per frame.  Color entries are min-max normalised per tensor (the
reference's ``make_grid(normalize=True)``); gray entries are clipped to
[0, 1] (``normalize=False``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from datetime import datetime

import numpy as np

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


@dataclasses.dataclass
class RunDirs:
    root: str
    weights: str
    runs: str


def make_run_dirs(result_root: str, model: str, comment: str) -> RunDirs:
    stamp = datetime.now().strftime("%b%d_%H-%M-%S")
    root = os.path.join(result_root, model, comment, stamp)
    dirs = RunDirs(root=root,
                   weights=os.path.join(root, "weights"),
                   runs=os.path.join(root, "runs"))
    for d in (dirs.root, dirs.weights, dirs.runs):
        os.makedirs(d, exist_ok=True)
    return dirs


def run_comment(cfg, gan: bool) -> str:
    """Reference run-dir comment strings (lib/train_gan.py:35-36 /
    lib/train_stcnn.py:37)."""
    base = f"b{cfg.batchsize}xd{cfg.nfr}xwh{cfg.isize}"
    if gan:
        return f"{base}_lr-{cfg.lr}_w-a{cfg.w_adv}c{cfg.w_con}"
    return f"{base}_lr{cfg.lr}"


def _to_grid(video: np.ndarray, normalize: bool) -> np.ndarray:
    """(B, T, H, W, C) float -> (T, C, H, B*W) uint8-range float grid."""
    v = np.asarray(video, np.float32)
    if normalize:
        lo, hi = v.min(), v.max()
        v = (v - lo) / (hi - lo + 1e-5)
    else:
        v = np.clip(v, 0.0, 1.0)
    if v.shape[-1] == 1:
        v = np.repeat(v, 3, axis=-1)
    b, t, h, w, c = v.shape
    grid = v.transpose(1, 2, 0, 3, 4).reshape(t, h, b * w, c)
    return grid.transpose(0, 3, 1, 2)  # (T, C, H, B*W)


class SummaryLogger:
    """TensorBoard writer; no-ops cleanly when disabled or unavailable."""

    def __init__(self, logdir: str, enabled: bool = True):
        self._writer = None
        if enabled and SummaryWriter is not None:
            self._writer = SummaryWriter(log_dir=logdir)

    @property
    def enabled(self) -> bool:
        """True when updates actually reach a writer — engines use this to
        skip building (and device->host fetching) TB-only video panels."""
        return self._writer is not None

    def dump_config(self, run_root: str, cfg) -> None:
        with open(os.path.join(run_root, "args.txt"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=4)

    def update(self, step: int, *, color_videos=None, gray_videos=None,
               errors=None, scores=None, hists=None) -> None:
        if self._writer is None:
            return
        for tag, v in (color_videos or {}).items():
            self._writer.add_video(tag, _to_grid(v, True)[None], step, fps=4)
        for tag, v in (gray_videos or {}).items():
            self._writer.add_video(tag, _to_grid(v, False)[None], step, fps=4)
        for tag, e in (errors or {}).items():
            head, tail = tag.rsplit("/", 1)
            self._writer.add_scalars(head, {tail: float(e)}, step)
        for tag, s in (scores or {}).items():
            self._writer.add_scalar(tag, float(s), step)
        for tag, h in (hists or {}).items():
            self._writer.add_histogram(tag, np.asarray(h), step)
        self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
