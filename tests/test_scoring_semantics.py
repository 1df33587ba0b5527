"""The two scoring pipelines' semantics on thin-edge masks.

The GT is a Canny *edge map* (1px boundaries, lib/data.py:102-105).  The
in-training sweeps score morphology-opened binary masks
(models/mygannet.py:395-399) — but a 5x5 opening removes any structure
thinner than the kernel, so even a perfect edge predictor scores AUC 0.5
there, while the standalone eval CLI's raw-sigmoid scoring
(test.py:181-186) ranks it perfectly.  Both behaviours are reference-
faithful; this test pins the distinction (PARITY.md "evaluation").
"""

import numpy as np
import jax.numpy as jnp

from vfd_gan_tpu.eval.metrics import evaluate
from vfd_gan_tpu.ops.image import threshold
from vfd_gan_tpu.ops.morphology import morphology_open


def _edge_gt(t=4, s=32):
    gt = np.zeros((1, t, s, s, 1), np.float32)
    for j in range(t):
        y0, x0 = 6 + 2 * j, 8
        gt[0, j, y0, x0:x0 + 10, 0] = 1
        gt[0, j, y0 + 9, x0:x0 + 10, 0] = 1
        gt[0, j, y0:y0 + 10, x0, 0] = 1
        gt[0, j, y0:y0 + 10, x0 + 9, 0] = 1
    return gt


def test_opening_erases_thin_edges_raw_ranks_them():
    gt = _edge_gt()
    # a near-perfect edge predictor
    pred = jnp.asarray(gt * 0.99 + 0.004)
    labels = gt.astype(np.int32).ravel()

    raw_auc = evaluate(labels, np.asarray(pred).ravel(), metric="roc")
    opened = morphology_open(threshold(pred))
    opened_auc = evaluate(labels, np.asarray(opened).ravel(), metric="roc")

    assert raw_auc > 0.99                      # eval-CLI semantics
    assert (np.asarray(opened) > 0).sum() == 0  # opening removes 1px edges
    assert abs(opened_auc - 0.5) < 1e-6        # in-training semantics
