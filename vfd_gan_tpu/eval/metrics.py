"""Pixel-level ROC / PR / F1 evaluation with curve artifacts.

Reference: lib/evaluate.py:14-91.  Semantics preserved:

* ``roc``  — sklearn ROC + AUC, EER from the interpolated curve; when the AUC
  beats ``best`` a curve PNG and a CSV of (fpr, tpr) are written as
  ``ROC_%03d.png`` / ``ROC_%03d`` (lib/evaluate.py:41-59).
* ``pr``   — precision-recall AUC with the same improved-only artifact rule
  (lib/evaluate.py:68-91).
* ``auprc``— average precision (lib/evaluate.py:63-65).
* ``f1_score`` — F1 at fixed threshold 0.20 (lib/evaluate.py:21-25).  The
  reference binarises the scores array *in place*, which is only harmless
  because its engines always call roc/pr before f1
  (models/mygannet.py:446-448); we binarise a copy so call order can't
  corrupt other metrics, and keep the same numeric result.

Metrics run on host (sklearn/scipy) — they are O(n log n) sorts over
flattened pixel arrays, not accelerator work.
"""

from __future__ import annotations

import csv
import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from scipy.interpolate import interp1d  # noqa: E402
from scipy.optimize import brentq  # noqa: E402
from sklearn.metrics import (  # noqa: E402
    auc,
    average_precision_score,
    f1_score as sk_f1_score,
    precision_recall_curve,
    roc_curve,
)


def roc_auc_with_eer(labels: np.ndarray, scores: np.ndarray):
    """Returns (auc, eer, fpr, tpr)."""
    fpr, tpr, _ = roc_curve(labels, scores)
    area = auc(fpr, tpr)
    try:
        eer = brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0.0, 1.0)
    except ValueError:  # degenerate curve
        eer = float("nan")
    return area, eer, fpr, tpr


def pr_auc(labels: np.ndarray, scores: np.ndarray):
    """Returns (auc, precision, recall)."""
    precision, recall, _ = precision_recall_curve(labels, scores)
    return auc(recall, precision), precision, recall


def _save_curve(xs, ys, *, path_png, path_csv, xlabel, ylabel, title, label,
                marker=None):
    fig = plt.figure()
    try:
        plt.plot(xs, ys, color="darkorange", lw=2, label=label)
        if marker is not None:
            plt.plot([marker[0]], [marker[1]], marker="o", markersize=5,
                     color="navy")
        plt.plot([0, 1], [1, 0], color="navy", lw=1, linestyle=":")
        plt.xlim([0.0, 1.0])
        plt.ylim([0.0, 1.05])
        plt.xlabel(xlabel)
        plt.ylabel(ylabel)
        plt.title(title)
        plt.legend(loc="lower right")
        plt.savefig(path_png)
    finally:
        plt.close(fig)
    with open(path_csv, "w", newline="") as f:
        writer = csv.writer(f)
        for row in zip(xs, ys):
            writer.writerow(row)


def evaluate(labels, scores, best: float | None = None, step: int | None = None,
             saveto: str | None = None, metric: str = "roc") -> float:
    """Metric dispatch mirroring reference ``evaluate`` (lib/evaluate.py:14-27)."""
    labels = np.asarray(labels).ravel()
    scores = np.asarray(scores).ravel()

    if metric == "roc":
        area, eer, fpr, tpr = roc_auc_with_eer(labels, scores)
        if saveto is not None and best is not None and area > best:
            _save_curve(
                fpr, tpr,
                path_png=os.path.join(saveto, "ROC_%03d.png" % step),
                path_csv=os.path.join(saveto, "ROC_%03d" % step),
                xlabel="False Positive Rate", ylabel="True Positive Rate",
                title="Receiver operating characteristic",
                label="(AUC = %0.2f, EER = %0.2f)" % (area, eer),
                marker=(eer, 1 - eer))
        return float(area)

    if metric == "pr":
        area, precision, recall = pr_auc(labels, scores)
        if saveto is not None and best is not None and area > best:
            _save_curve(
                recall, precision,
                path_png=os.path.join(saveto, "PR_%03d.png" % step),
                path_csv=os.path.join(saveto, "PR_%03d" % step),
                xlabel="Recall", ylabel="Precision",
                title="Precision-Recall Curve",
                label="(AUC = %0.2f)" % area)
        return float(area)

    if metric == "auprc":
        return float(average_precision_score(labels, scores))

    if metric == "f1_score":
        binary = np.where(scores >= 0.20, 1, 0)
        return float(sk_f1_score(labels, binary))

    raise NotImplementedError(f"unknown evaluation metric {metric!r}")
