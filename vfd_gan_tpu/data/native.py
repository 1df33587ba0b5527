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


class RingQueue:
    """SPSC queue over the native prefetch ring (decode thread -> train
    loop).  Slot *sequencing* is native (lock-free atomics); the Python
    objects ride in a slot table.  Falls back to queue.Queue semantics via
    :func:`make_queue` when the native library is unavailable."""

    def __init__(self, n_slots: int, spin_sleep: float = 0.001):
        import ctypes
        lib = _load()
        assert lib is not None
        lib.vfd_ring_create.restype = ctypes.c_void_p
        lib.vfd_ring_create.argtypes = [ctypes.c_int64]
        for fn in ("vfd_ring_acquire_produce", "vfd_ring_acquire_consume"):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        for fn in ("vfd_ring_publish", "vfd_ring_release"):
            getattr(lib, fn).restype = None
            getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.vfd_ring_destroy.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._ring = lib.vfd_ring_create(n_slots)
        self._slots: list = [None] * n_slots
        self._sleep = spin_sleep

    def put(self, item, stop_event=None) -> bool:
        """Blocking put; returns False if ``stop_event`` fires first."""
        import time
        while True:
            slot = self._lib.vfd_ring_acquire_produce(self._ring)
            if slot >= 0:
                break
            if stop_event is not None and stop_event.is_set():
                return False
            time.sleep(self._sleep)
        self._slots[slot] = item
        self._lib.vfd_ring_publish(self._ring, slot)
        return True

    def get(self):
        import time
        while True:
            slot = self._lib.vfd_ring_acquire_consume(self._ring)
            if slot >= 0:
                break
            time.sleep(self._sleep)
        item = self._slots[slot]
        self._slots[slot] = None
        self._lib.vfd_ring_release(self._ring, slot)
        return item

    def __del__(self):
        if getattr(self, "_ring", None):
            self._lib.vfd_ring_destroy(self._ring)
            self._ring = None


class _PyQueue:
    """queue.Queue fallback with the RingQueue interface."""

    def __init__(self, n_slots: int):
        import queue
        self._q = queue.Queue(maxsize=n_slots)

    def put(self, item, stop_event=None) -> bool:
        import queue as _q
        while True:
            try:
                self._q.put(item, timeout=0.1)
                return True
            except _q.Full:
                if stop_event is not None and stop_event.is_set():
                    return False

    def get(self):
        return self._q.get()


def make_queue(n_slots: int):
    """Native SPSC ring when available, queue.Queue otherwise."""
    return RingQueue(n_slots) if available() else _PyQueue(n_slots)


def pack_clips(clips: list[np.ndarray], invert: bool = False,
               n_threads: int | None = None) -> np.ndarray:
    """Pack K identically-shaped uint8 clips into one (K, ...) batch.

    Threads default to min(K, cpu_count) capped at 4; on a single-core host
    one thread wins (measured 0.44 ms vs 0.52 ms np.stack vs 0.92 ms with
    needless threads for a b4 staged batch)."""
    if n_threads is None:
        n_threads = max(1, min(len(clips), os.cpu_count() or 1, 4))
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
