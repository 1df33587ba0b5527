"""Degenerate-input hardening (VERDICT.md round-1 Weak #6/#8): empty test
splits and single-class labels must report NaN/skip cleanly instead of
crashing the sweep accumulation (previously ``np.stack([])``)."""

import numpy as np
import pytest

from vfd_gan_tpu.config import Config
from vfd_gan_tpu.data import ClipBatchIterator, MdfVideoDataset
from vfd_gan_tpu.data.synthetic import make_dataset
from vfd_gan_tpu.ops.augment import staging_size
from vfd_gan_tpu.train.engine_base import SweepAccumulator


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("deg_vids"))
    return make_dataset(root, n_train=1, n_test=1, frames=16, size=40)


def _iters(cfg, train_list, test_list, test_batch: int):
    """Train iterator at cfg.batchsize; test iterator at ``test_batch``
    (oversized => zero drop-last batches => empty sweep)."""
    train_ds = MdfVideoDataset(train_list, cfg.nfr,
                               staging=staging_size(cfg.isize))
    test_ds = MdfVideoDataset(test_list, cfg.nfr, staging=cfg.isize)
    return (ClipBatchIterator(train_ds, cfg.batchsize, seed=1),
            ClipBatchIterator(test_ds, test_batch, seed=1))


def test_sweep_accumulator_basics():
    s = SweepAccumulator()
    assert s.n == 0 and s.mean_metrics() == {}
    s.add(np.zeros(3), np.ones(3), {"m": 2.0})
    s.add(np.zeros(3), np.ones(3), {"m": 4.0})
    assert s.n == 2
    assert s.mean_metrics() == {"m": 3.0}
    gts, preds = s.stacked()
    assert gts.shape == (2, 3) and preds.shape == (2, 3)


def test_supervised_empty_test_split(data, tmp_path):
    from vfd_gan_tpu.train.supervised_engine import SupervisedEngine
    train_list, test_list = data
    cfg = Config(model="clstm", ep=1, isize=16, nfr=8, batchsize=1, freq=1,
                 result_root=str(tmp_path), compute_dtype="float32",
                 tensorboard=False, max_steps=1,
                 tr_plist=train_list, ts_plist=test_list).validate()
    eng = SupervisedEngine(cfg, *_iters(cfg, train_list, test_list,
                                        test_batch=64))
    eng.train()  # freq=1 -> the empty sweep runs on the first step
    eng.close()
    assert np.isnan(eng.scores["score/roc"])
    assert np.isnan(eng.scores["score/pr"])


def test_anogan_empty_test_split(data, tmp_path):
    from vfd_gan_tpu.train.anogan_engine import AnoGanEngine
    train_list, test_list = data
    cfg = Config(model="anogan", ep=1, isize=32, nfr=8, batchsize=1, freq=1,
                 lr=2e-4, result_root=str(tmp_path), compute_dtype="float32",
                 tensorboard=False, max_steps=1,
                 tr_plist=train_list, ts_plist=test_list).validate()
    eng = AnoGanEngine(cfg, *_iters(cfg, train_list, test_list,
                                    test_batch=64))
    eng.train()
    eng.close()
    assert np.isnan(eng.scores["score/roc"])


def test_ganomaly_empty_test_split(data, tmp_path):
    from vfd_gan_tpu.train.ganomaly_engine import GanomalyEngine
    train_list, test_list = data
    cfg = Config(model="ganomaly", ep=1, isize=32, nfr=8, batchsize=1, freq=1,
                 lr=2e-4, result_root=str(tmp_path), compute_dtype="float32",
                 tensorboard=False, max_steps=1,
                 tr_plist=train_list, ts_plist=test_list).validate()
    eng = GanomalyEngine(cfg, *_iters(cfg, train_list, test_list,
                                      test_batch=64))
    eng.train()
    eng.close()
    assert np.isnan(eng.scores["score/roc"])


def test_single_class_labels_report_nan_and_skip_save(tmp_path):
    """All-negative pixel labels: ROC is NaN (sklearn degenerate curve) and
    the if-roc-elif-pr rule must not save a 'best' checkpoint."""
    from vfd_gan_tpu.train.engine_base import EngineBase

    eng = EngineBase.__new__(EngineBase)  # scoring needs no full engine
    eng.best_roc = 0.0
    eng.best_pr = 0.0
    eng.epoch = 0
    eng.scores = {}

    class Dirs:
        root = str(tmp_path)
    eng.dirs = Dirs()

    saved = []
    gts = [np.zeros((2, 4, 4), np.float32)]
    preds = [np.random.default_rng(0).uniform(size=(2, 4, 4))]
    roc, pr, f1 = eng.score_and_checkpoint(gts, preds, saved.append)
    assert np.isnan(roc)
    assert saved == []  # NaN never beats best

    # config guard: mygan rejects sizes its topology cannot support
    with pytest.raises(ValueError, match="mygan"):
        Config(model="mygan", isize=32, nfr=16).validate()
    with pytest.raises(ValueError, match="mygan"):
        Config(model="mygan", isize=64, nfr=8).validate()
