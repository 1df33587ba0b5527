"""Native host-runtime library: build, bindings, parity with Python paths."""

import ctypes

import numpy as np
import pytest

from vfd_gan_tpu.data import native


def test_native_builds_and_loads():
    assert native.available(), "native/libvfd_host.so failed to build"


def test_window_table_matches_reference_arithmetic():
    video, first = native.window_table([24, 24], nfr=8)
    assert len(video) == 6
    # reference quirks: index 0/1 both -> window 0; boundary index selects
    # the previous video's last window (lib/data.py:84-89)
    assert first.tolist() == [0, 0, 8, 16, 0, 8]
    assert video.tolist() == [0, 0, 0, 0, 1, 1]


def test_pack_clips_matches_numpy():
    rng = np.random.default_rng(0)
    clips = [rng.integers(0, 255, (4, 8, 8, 3), dtype=np.uint8)
             for _ in range(5)]
    got = native.pack_clips(clips)
    np.testing.assert_array_equal(got, np.stack(clips))
    inv = native.pack_clips(clips, invert=True)
    np.testing.assert_array_equal(inv, ~np.stack(clips))


def test_prefetch_ring_roundtrip():
    if not native.available():
        pytest.skip("native lib unavailable")
    lib = native._load()
    lib.vfd_ring_create.restype = ctypes.c_void_p
    lib.vfd_ring_create.argtypes = [ctypes.c_int64]
    for fn in ("vfd_ring_acquire_produce", "vfd_ring_acquire_consume"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in ("vfd_ring_publish", "vfd_ring_release"):
        getattr(lib, fn).restype = None
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.vfd_ring_destroy.argtypes = [ctypes.c_void_p]

    ring = lib.vfd_ring_create(2)
    assert lib.vfd_ring_acquire_consume(ring) == -1      # empty
    s0 = lib.vfd_ring_acquire_produce(ring)
    assert s0 == 0
    lib.vfd_ring_publish(ring, s0)
    s1 = lib.vfd_ring_acquire_produce(ring)
    assert s1 == 1
    lib.vfd_ring_publish(ring, s1)
    assert lib.vfd_ring_acquire_produce(ring) == -1      # full
    assert lib.vfd_ring_acquire_consume(ring) == 0
    lib.vfd_ring_release(ring, 0)
    assert lib.vfd_ring_acquire_consume(ring) == 1
    lib.vfd_ring_release(ring, 1)
    assert lib.vfd_ring_acquire_consume(ring) == -1      # drained
    lib.vfd_ring_destroy(ring)
