"""Evaluation artifact rules + misc scaffolding semantics."""


import numpy as np
import pytest

from vfd_gan_tpu.config import Config
from vfd_gan_tpu.eval.metrics import evaluate
from vfd_gan_tpu.obs.summary import run_comment
from vfd_gan_tpu.parallel.mesh import auto_dp

rng = np.random.default_rng(51)


def _labels_scores(n=500):
    labels = (rng.uniform(size=n) > 0.7).astype(np.int32)
    scores = labels * rng.uniform(0.4, 1.0, n) + (1 - labels) * rng.uniform(
        0.0, 0.6, n)
    return labels, scores.astype(np.float32)


def test_roc_artifacts_written_only_on_improvement(tmp_path):
    labels, scores = _labels_scores()
    # improvement over best=0 -> artifacts written (lib/evaluate.py:41-59)
    auc = evaluate(labels, scores, best=0.0, step=3, saveto=str(tmp_path),
                   metric="roc")
    assert 0.5 < auc <= 1.0
    assert (tmp_path / "ROC_003.png").exists()
    assert (tmp_path / "ROC_003").exists()
    # no improvement over best=1.0 -> nothing new written
    evaluate(labels, scores, best=1.0, step=4, saveto=str(tmp_path),
             metric="roc")
    assert not (tmp_path / "ROC_004.png").exists()


def test_pr_and_auprc_and_f1(tmp_path):
    labels, scores = _labels_scores()
    pr = evaluate(labels, scores, best=0.0, step=1, saveto=str(tmp_path),
                  metric="pr")
    assert (tmp_path / "PR_001.png").exists()
    ap = evaluate(labels, scores, metric="auprc")
    f1 = evaluate(labels, scores, metric="f1_score")
    assert 0 < pr <= 1 and 0 < ap <= 1 and 0 <= f1 <= 1
    # f1 must not mutate the caller's scores (divergence from the
    # reference's in-place binarisation, PARITY.md)
    assert scores.dtype == np.float32 and not set(
        np.unique(scores)).issubset({0.0, 1.0})
    with pytest.raises(NotImplementedError):
        evaluate(labels, scores, metric="nope")


def test_run_comment_formats():
    cfg = Config(batchsize=4, nfr=16, isize=128, lr=2e-5, w_adv=1.0,
                 w_con=10.0)
    # reference formats: lib/train_gan.py:35-36, lib/train_stcnn.py:37
    assert run_comment(cfg, gan=True) == "b4xd16xwh128_lr-2e-05_w-a1.0c10.0"
    assert run_comment(cfg, gan=False) == "b4xd16xwh128_lr2e-05"


def test_auto_dp_divides_batch():
    assert auto_dp(4, 0, n_devices=8) == 4
    assert auto_dp(8, 0, n_devices=8) == 8
    assert auto_dp(6, 0, n_devices=8) == 6
    assert auto_dp(5, 4, n_devices=8) == 1   # 5 % {4,3,2} != 0
    assert auto_dp(12, 8, n_devices=8) == 6
