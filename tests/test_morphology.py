"""Morphological opening vs cv2 oracles.

Two distinct semantics exist (PARITY.md "morphology plane"):

* ``plane="hw"`` — the *intended* per-frame (H, W) opening; oracle is
  cv2.morphologyEx applied frame by frame.
* ``plane="th"`` — what the reference *actually* computes
  (lib/utils.py:139-147): it hands cv2 a ``(T, H, W)`` array, which cv2
  reads as a T-row x H-col image with W channels, so the opening runs in
  the (T, H) plane independently per W column.  Oracle is cv2 on the raw
  ``(T, H, W)`` array, exactly the reference call.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vfd_gan_tpu.ops import morphology_open, video_open

rng = np.random.default_rng(2)


@pytest.mark.parametrize("k", [3, 5])
def test_open_hw_matches_per_frame_cv2(k):
    cv2 = pytest.importorskip("cv2")
    img = (rng.uniform(size=(16, 16)) > 0.6).astype(np.float32)
    kernel = np.ones((k, k), np.uint8)
    want = cv2.morphologyEx(img, cv2.MORPH_OPEN, kernel)
    x = jnp.asarray(img)[None, None, :, :, None]  # (B=1,T=1,H,W,C=1)
    got = np.asarray(video_open(x, "hw", k=k))[0, 0, :, :, 0]
    np.testing.assert_array_equal(got, want)


def test_open_th_matches_reference_cv2_call():
    """Bit-match against the reference's actual morphology_proc computation
    (lib/utils.py:139-147): cv2.morphologyEx on the raw (T, H, W) array."""
    cv2 = pytest.importorskip("cv2")
    b, t, h, w = 2, 16, 12, 10
    vid = (rng.uniform(size=(b, t, h, w)) > 0.55).astype(np.float32)
    kernel = np.ones((5, 5), np.uint8)
    want = np.stack([cv2.morphologyEx(v, cv2.MORPH_OPEN, kernel)
                     for v in vid])
    got = np.asarray(video_open(jnp.asarray(vid)[..., None], "th"))[..., 0]
    np.testing.assert_array_equal(got, want)


def test_th_plane_erases_single_frame_blob_hw_keeps_it():
    """The advisor's demonstration case: an 8x8 single-frame blob survives a
    per-frame opening but is erased by the reference's (T, H)-plane opening
    unless it persists >= 5 frames."""
    vid = np.zeros((1, 16, 24, 24, 1), np.float32)
    vid[0, 7, 8:16, 8:16, 0] = 1.0            # one frame only
    kept = np.asarray(video_open(jnp.asarray(vid), "hw"))
    gone = np.asarray(video_open(jnp.asarray(vid), "th"))
    assert kept.sum() > 0
    assert gone.sum() == 0

    vid[0, 5:12, 8:16, 8:16, 0] = 1.0          # persists 7 frames
    survives = np.asarray(video_open(jnp.asarray(vid), "th"))
    assert survives.sum() > 0


def test_open_removes_specks_keeps_blobs():
    img = np.zeros((20, 20), np.float32)
    img[3, 3] = 1.0                       # lone speck -> removed by 5x5 open
    img[8:16, 8:16] = 1.0                 # 8x8 blob -> survives
    x = jnp.asarray(img)[None, None, :, :, None]
    out = np.asarray(morphology_open(x))[0, 0, :, :, 0]
    assert out[3, 3] == 0.0
    assert out[10:14, 10:14].min() == 1.0


def test_pallas_transpose_path_matches_reduce_window_th_plane():
    """The Pallas dispatch transposes an arbitrary opening plane to the
    trailing axes; verify (interpret mode) it matches the reduce_window
    path for the (T, H) plane."""
    vid = (rng.uniform(size=(2, 16, 12, 10, 1)) > 0.55).astype(np.float32)
    x = jnp.asarray(vid)
    want = np.asarray(video_open(x, "th", use_pallas=False))
    got = np.asarray(morphology_open(x, 5, (1, 2), use_pallas=True,
                                     interpret=True))
    np.testing.assert_array_equal(got, want)
