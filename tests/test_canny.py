"""On-device Canny-equivalent vs cv2 on synthetic mask frames."""

import numpy as np
import jax.numpy as jnp
import pytest

from vfd_gan_tpu.ops.canny import canny_edges, mask_edge_frames_device


def test_rectangle_edges_match_cv2_closely():
    cv2 = pytest.importorskip("cv2")
    img = np.zeros((48, 48), np.uint8)
    img[12:36, 16:40] = 255
    want = cv2.Canny(img, 100, 200) > 0
    got = np.asarray(canny_edges(jnp.asarray(img[None], jnp.float32)))[0] > 0
    # both mark the rectangle boundary; allow 1px band differences
    inter = (want & got).sum()
    union = (want | got).sum()
    assert union > 0 and inter / union > 0.5
    # no edges in flat interior/exterior
    assert not got[20:30, 22:34].any()
    assert not got[:8, :8].any()


def test_mask_edge_frames_device_pipeline():
    # white frame with black forged square -> edges on the square boundary
    frame = np.full((1, 32, 32, 3), 255, np.uint8)
    frame[0, 8:24, 8:24] = 0
    out = np.asarray(mask_edge_frames_device(jnp.asarray(frame)))[0]
    assert out.shape == (32, 32)
    assert out[8, 8:24].any() or out[7, 8:24].any()   # top boundary marked
    assert not out[14:18, 14:18].any()                # interior clean
