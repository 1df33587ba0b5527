"""Device-side metrics == sklearn/scipy on the same arrays.

Covers ties (quantised scores), imbalance, binary scores (the GAN sweep's
opened masks), and degenerate single-class input."""

import numpy as np
import pytest

from vfd_gan_tpu.eval.device_metrics import (f1_at, pr_auc, roc_auc,
                                             roc_eer, score_sweep)
from vfd_gan_tpu.eval.metrics import (pr_auc as sk_pr,
                                      roc_auc_with_eer)
from sklearn.metrics import f1_score as sk_f1


def _cases():
    rng = np.random.default_rng(0)
    n = 5000
    labels = (rng.uniform(size=n) < 0.03).astype(np.float32)
    smooth = np.clip(rng.normal(0.2, 0.2, n) + 0.5 * labels, 0, 1)
    yield "smooth", labels, smooth.astype(np.float32)
    # heavy ties: 8-bit quantised scores
    yield "quantised", labels, (np.round(smooth * 255) / 255).astype(
        np.float32)
    # binary scores (morphology-opened masks — the GAN sweep's case)
    yield "binary", labels, (smooth > 0.4).astype(np.float32)
    # balanced classes
    lab2 = (rng.uniform(size=n) < 0.5).astype(np.float32)
    yield "balanced", lab2, np.clip(
        rng.normal(0, 0.3, n) + 0.3 * lab2, -1, 2).astype(np.float32)


@pytest.mark.parametrize("name,labels,scores",
                         list(_cases()),
                         ids=[c[0] for c in _cases()])
def test_matches_sklearn(name, labels, scores):
    want_auc, want_eer, _, _ = roc_auc_with_eer(labels, scores)
    want_pr, _, _ = sk_pr(labels, scores)
    binned = scores.copy()
    binned[binned >= 0.20] = 1
    binned[binned < 0.20] = 0
    want_f1 = sk_f1(labels, binned)

    got_auc = float(roc_auc(labels, scores))
    got_eer = float(roc_eer(labels, scores))
    got_pr = float(pr_auc(labels, scores))
    got_f1 = float(f1_at(labels, scores))

    assert abs(got_auc - want_auc) < 1e-5, (got_auc, want_auc)
    assert abs(got_pr - want_pr) < 1e-5, (got_pr, want_pr)
    assert abs(got_f1 - want_f1) < 1e-6, (got_f1, want_f1)
    if np.isfinite(want_eer):
        assert abs(got_eer - want_eer) < 1e-5, (got_eer, want_eer)


def test_score_sweep_jit_and_int_cast():
    rng = np.random.default_rng(1)
    gts = rng.uniform(0, 1, (4, 8, 16, 16, 1)).astype(np.float32)
    gts[gts > 0.97] = 1.0                 # a few exact positives
    preds = rng.uniform(0, 1, gts.shape).astype(np.float32)
    roc, eer, pr, f1 = (float(x) for x in score_sweep(gts, preds))
    # reference int32 cast: fractional gt pixels truncate to 0
    labels = np.asarray(gts, dtype=np.int32).ravel()
    want_auc, want_eer, _, _ = roc_auc_with_eer(labels, preds.ravel())
    assert abs(roc - want_auc) < 1e-5
    assert abs(eer - want_eer) < 1e-5


def test_single_class_is_nan():
    labels = np.zeros(100, np.float32)
    scores = np.linspace(0, 1, 100).astype(np.float32)
    assert np.isnan(float(roc_auc(labels, scores)))
    assert np.isnan(float(roc_eer(labels, scores)))
    assert np.isnan(float(pr_auc(labels, scores)))


def test_engine_sweep_device_scoring_matches_host(tmp_path, tmp_path_factory):
    """--device_scoring: the supervised engine's periodic sweep scores the
    same roc/pr/f1 as the sklearn host path on identical weights+data."""
    from vfd_gan_tpu.cli.trainer import build_iterators
    from vfd_gan_tpu.config import Config
    from vfd_gan_tpu.data.synthetic import make_dataset
    from vfd_gan_tpu.train.supervised_engine import SupervisedEngine

    root = str(tmp_path_factory.mktemp("devscore_vids"))
    # size == isize: the test split must not resize the GT, or the 1-px
    # Canny labels go fractional and int-truncate to a single class
    train_list, test_list = make_dataset(root, n_train=1, n_test=1,
                                         frames=16, size=16)
    results = {}
    for flag in (False, True):
        cfg = Config(model="clstm", isize=16, nfr=8, batchsize=2, ep=1,
                     freq=10 ** 6, device_scoring=flag, seed=3,
                     result_root=str(tmp_path), tensorboard=False,
                     compute_dtype="float32", tr_plist=train_list,
                     ts_plist=test_list).validate()
        eng = SupervisedEngine(cfg, *build_iterators(cfg))
        results[flag] = eng.test()
        if flag:
            assert "score/eer" in eng.scores
        eng.close()

    for a, b in zip(results[False], results[True]):
        np.testing.assert_allclose(a, b, atol=1e-5)
