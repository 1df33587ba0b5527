"""ctypes bindings for the native host runtime (native/vfd_host.cpp).

Builds lazily with make on first use; every entry point has a pure-Python
fallback so the framework runs without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvfd_host.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vfd_window_table.restype = ctypes.c_int64
        lib.vfd_window_table.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.vfd_pack_clips.restype = None
        lib.vfd_pack_clips.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def window_table(frames_per_video, nfr: int):
    """(video_idx, first_frame) arrays for every dataset index, with the
    reference's boundary arithmetic (lib/data.py:84-89)."""
    frames = np.ascontiguousarray(frames_per_video, dtype=np.int64)
    total = int((frames // nfr).sum())
    lib = _load()
    if lib is None:  # pure-python fallback
        cum = np.cumsum(frames // nfr)
        video = np.empty(total, np.int64)
        first = np.empty(total, np.int64)
        for index in range(total):
            v = int(np.argmax(cum >= index))
            prev = int(cum[v - 1]) if v > 0 else 0
            video[index] = v
            first[index] = max(0, (index - prev - 1) * nfr)
        return video, first
    video = np.empty(total, np.int64)
    first = np.empty(total, np.int64)
    n = lib.vfd_window_table(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(frames), nfr,
        video.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        first.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    assert n == total
    return video, first


def pack_clips(clips: list[np.ndarray], invert: bool = False,
               n_threads: int = 2) -> np.ndarray:
    """Pack K identically-shaped uint8 clips into one (K, ...) batch."""
    lib = _load()
    if lib is None:
        batch = np.stack(clips)
        return ~batch if invert else batch
    clips = [np.ascontiguousarray(c, dtype=np.uint8) for c in clips]
    out = np.empty((len(clips),) + clips[0].shape, np.uint8)
    ptrs = (ctypes.c_void_p * len(clips))(
        *[c.ctypes.data_as(ctypes.c_void_p).value for c in clips])
    lib.vfd_pack_clips(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)), len(clips),
        clips[0].nbytes, out.ctypes.data_as(ctypes.c_void_p),
        1 if invert else 0, n_threads)
    return out
