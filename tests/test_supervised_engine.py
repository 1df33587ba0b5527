"""End-to-end supervised training on synthetic data (SURVEY.md §4
integration tests) — runs the full engine loop on the fake 8-device CPU mesh."""

import os

import numpy as np
import pytest

from vfd_gan_tpu.config import Config
from vfd_gan_tpu.data import ClipBatchIterator, MdfVideoDataset
from vfd_gan_tpu.data.synthetic import make_dataset
from vfd_gan_tpu.ops.augment import staging_size
from vfd_gan_tpu.train.supervised_engine import SupervisedEngine


@pytest.fixture(scope="module")
def loaders(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("engine_vids"))
    train_list, test_list = make_dataset(root, n_train=2, n_test=1,
                                         frames=24, size=48)
    return root, train_list, test_list


def _make_iters(cfg, train_list, test_list):
    train_ds = MdfVideoDataset(train_list, cfg.nfr,
                               staging=staging_size(cfg.isize))
    test_ds = MdfVideoDataset(test_list, cfg.nfr, staging=cfg.isize)
    return (ClipBatchIterator(train_ds, cfg.batchsize, seed=cfg.seed),
            ClipBatchIterator(test_ds, cfg.batchsize, seed=cfg.seed))


def test_clstm_end_to_end(loaders, tmp_path):
    root, train_list, test_list = loaders
    cfg = Config(model="clstm", ep=1, isize=16, nfr=8, batchsize=2,
                 freq=3, lr=1e-3, result_root=str(tmp_path),
                 compute_dtype="float32", tensorboard=True,
                 tr_plist=train_list, ts_plist=test_list).validate()
    eng = SupervisedEngine(cfg, *_make_iters(cfg, train_list, test_list))
    eng.train()
    eng.close()

    assert eng.global_step > 0
    assert "loss/err/train" in eng.errors
    assert np.isfinite(eng.errors["loss/err/train"])
    # periodic test ran and produced scores
    assert "score/roc" in eng.scores
    assert 0.0 <= eng.scores["score/roc"] <= 1.0
    # best-metric checkpoint was written (first test always improves on 0)
    assert os.listdir(eng.dirs.weights)
    # TB event file exists
    assert any(f.startswith("events") for f in os.listdir(eng.dirs.runs))


def test_resume_restores_state(loaders, tmp_path):
    root, train_list, test_list = loaders
    cfg = Config(model="clstm", ep=1, isize=16, nfr=8, batchsize=2,
                 freq=100, lr=1e-3, result_root=str(tmp_path),
                 compute_dtype="float32", tensorboard=False,
                 tr_plist=train_list, ts_plist=test_list).validate()
    eng = SupervisedEngine(cfg, *_make_iters(cfg, train_list, test_list))
    # save a checkpoint, then build a fresh engine resuming from it
    eng._save_weights("roc")
    ckpt = os.path.join(eng.dirs.weights, os.listdir(eng.dirs.weights)[0])
    eng.close()

    cfg2 = Config(**{**cfg.__dict__, "resume": ckpt})
    eng2 = SupervisedEngine(cfg2, *_make_iters(cfg, train_list, test_list))
    a = np.asarray(next(iter(
        np.asarray(x) for x in
        __import__("jax").tree_util.tree_leaves(eng.state.params))))
    b = np.asarray(next(iter(
        np.asarray(x) for x in
        __import__("jax").tree_util.tree_leaves(eng2.state.params))))
    np.testing.assert_array_equal(a, b)
    eng2.close()
