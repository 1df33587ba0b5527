"""Device-side (jit-able) ROC / EER / PR / F1 over pixel score arrays.

TPU-native counterpart of ``eval/metrics.py``'s sklearn path: the periodic
test sweep scores millions of pixels, and the host path must fetch the full
gt/pred arrays before sorting them on CPU.  Here the whole aggregation —
one sort + cumulative sums — runs on device and only four scalars cross
the link.  Built for ``--device_scoring`` sweeps and remote-attachment /
large-scale eval; NOT used for the curve-artifact path (PNG/CSV plotting
needs the host arrays anyway).

Numerics match sklearn/scipy (pinned in tests/test_device_metrics.py):

* ROC-AUC via the Mann-Whitney rank-sum with midranks for ties — exactly
  the trapezoidal area under ``sklearn.roc_curve`` (which emits one point
  per unique score, making trapezoids over tie plateaus == midrank sums).
* EER solves ``1 - x - interp1d(fpr, tpr)(x) = 0`` (reference
  test.py:68 / lib/evaluate.py) piecewise-linearly in the fpr domain —
  the same function brentq roots, solved in closed form on the segment
  where the sign flips.
* PR-AUC integrates precision over recall with the trapezoid rule on the
  ``precision_recall_curve`` points (the reference's ``auc(recall,
  precision)``, lib/evaluate.py:88 — NOT average precision).
* F1 at the reference's fixed 0.20 threshold (test.py:49-52).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rank_stats(labels, scores):
    """Sorted labels (by descending score), tie midranks, and counts."""
    labels = labels.reshape(-1).astype(jnp.float32)
    scores = scores.reshape(-1).astype(jnp.float32)
    n = scores.shape[0]
    s_sorted = jnp.sort(scores)                       # ascending
    # midrank of each element among ALL scores (1-based): ties share the
    # average of their run's ranks == (left + right + 1) / 2
    lo = jnp.searchsorted(s_sorted, scores, side="left")
    hi = jnp.searchsorted(s_sorted, scores, side="right")
    midrank = (lo + hi + 1).astype(jnp.float32) * 0.5
    npos = jnp.sum(labels)
    nneg = n - npos
    return labels, scores, midrank, npos, nneg


def roc_auc(labels, scores) -> jnp.ndarray:
    """Frame/pixel ROC-AUC (f32 scalar; NaN on single-class input)."""
    labels, _, midrank, npos, nneg = _rank_stats(labels, scores)
    rank_sum = jnp.sum(midrank * labels)
    area = (rank_sum - npos * (npos + 1.0) * 0.5) / (npos * nneg)
    return jnp.where((npos > 0) & (nneg > 0), area, jnp.nan)


def _curve(labels, scores):
    """fpr/tpr arrays at descending unique-score thresholds, sklearn-style
    (padded to fixed length n+1 with the final (1,1) point repeated)."""
    labels = labels.reshape(-1).astype(jnp.float32)
    scores = scores.reshape(-1).astype(jnp.float32)
    order = jnp.argsort(-scores)
    s_desc = scores[order]
    l_desc = labels[order]
    tps = jnp.cumsum(l_desc)
    fps = jnp.cumsum(1.0 - l_desc)
    # threshold points = last index of each unique-score run
    is_last = jnp.concatenate([s_desc[1:] != s_desc[:-1],
                               jnp.ones((1,), bool)])
    npos, nneg = tps[-1], fps[-1]
    tpr = tps / jnp.maximum(npos, 1.0)
    fpr = fps / jnp.maximum(nneg, 1.0)
    # compress: keep only run-ends, pad the rest with the terminal point
    # (monotone duplicates do not change trapezoid area or the EER root)
    n = scores.shape[0]
    idx = jnp.where(is_last, jnp.arange(n), n - 1)
    idx = jnp.sort(idx)
    fpr_c = jnp.concatenate([jnp.zeros((1,)), fpr[idx]])
    tpr_c = jnp.concatenate([jnp.zeros((1,)), tpr[idx]])
    return fpr_c, tpr_c, npos, nneg


def roc_eer(labels, scores) -> jnp.ndarray:
    """EER: the x with interp(tpr over fpr)(x) == 1 - x (test.py:68)."""
    fpr, tpr, npos, nneg = _curve(labels, scores)
    # g(x) = 1 - x - tpr(x) is non-increasing; find the segment where it
    # crosses zero and solve the linear equation on it
    g = 1.0 - fpr - tpr
    crosses = (g[:-1] > 0) & (g[1:] <= 0)
    i = jnp.argmax(crosses)                      # first crossing segment
    x0, x1 = fpr[i], fpr[i + 1]
    t0, t1 = tpr[i], tpr[i + 1]
    dx = x1 - x0
    slope = jnp.where(dx > 0, (t1 - t0) / jnp.where(dx > 0, dx, 1.0), 0.0)
    # 1 - x - (t0 + slope (x - x0)) = 0
    x = (1.0 - t0 + slope * x0) / (1.0 + slope)
    x = jnp.where(dx > 0, x, x0)                 # vertical segment: x = x0
    ok = (npos > 0) & (nneg > 0) & jnp.any(crosses)
    return jnp.where(ok, jnp.clip(x, 0.0, 1.0), jnp.nan)


def pr_auc(labels, scores) -> jnp.ndarray:
    """Trapezoidal area of precision over recall at unique-score thresholds
    (sklearn ``auc(recall, precision)`` on ``precision_recall_curve``)."""
    labels = labels.reshape(-1).astype(jnp.float32)
    scores = scores.reshape(-1).astype(jnp.float32)
    order = jnp.argsort(-scores)
    l_desc = labels[order]
    s_desc = scores[order]
    tps = jnp.cumsum(l_desc)
    fps = jnp.cumsum(1.0 - l_desc)
    is_last = jnp.concatenate([s_desc[1:] != s_desc[:-1],
                               jnp.ones((1,), bool)])
    npos = tps[-1]
    precision = tps / jnp.maximum(tps + fps, 1.0)
    recall = tps / jnp.maximum(npos, 1.0)
    n = scores.shape[0]
    idx = jnp.sort(jnp.where(is_last, jnp.arange(n), n - 1))
    # sklearn's curve runs threshold-descending REVERSED (recall 1 -> 0)
    # and appends a final (recall 0, precision 1) anchor; area via
    # trapezoid over the recall axis — duplicated padding points add 0.
    r = jnp.concatenate([recall[idx][::-1], jnp.zeros((1,))])
    p = jnp.concatenate([precision[idx][::-1], jnp.ones((1,))])
    area = jnp.abs(jnp.sum((r[1:] - r[:-1]) * (p[1:] + p[:-1]) * 0.5))
    return jnp.where(npos > 0, area, jnp.nan)


def f1_at(labels, scores, threshold: float = 0.20) -> jnp.ndarray:
    """F1 with scores binarised at the reference's fixed threshold
    (test.py:49-52)."""
    labels = labels.reshape(-1).astype(jnp.float32)
    pred = (scores.reshape(-1) >= threshold).astype(jnp.float32)
    tp = jnp.sum(pred * labels)
    fp = jnp.sum(pred * (1.0 - labels))
    fn = jnp.sum((1.0 - pred) * labels)
    denom = 2.0 * tp + fp + fn
    return jnp.where(denom > 0, 2.0 * tp / denom, 0.0)


@jax.jit
def score_sweep(gts, preds):
    """All four sweep scalars in one jitted call: (roc, eer, pr, f1).

    ``gts`` is truncated to int32 first — the reference's
    ``np.asarray(gts, dtype=np.int32)`` cast (models/mygannet.py:444) that
    binarises fractional resized mask edges to 0."""
    labels = gts.reshape(-1).astype(jnp.int32).astype(jnp.float32)
    scores = preds.reshape(-1).astype(jnp.float32)
    return (roc_auc(labels, scores), roc_eer(labels, scores),
            pr_auc(labels, scores), f1_at(labels, scores))
