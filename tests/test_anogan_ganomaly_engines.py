"""AnoGAN and GANomaly engine integration tests (tiny shapes)."""

import jax
import numpy as np
import pytest

from vfd_gan_tpu.config import Config
from vfd_gan_tpu.data import ClipBatchIterator, MdfVideoDataset
from vfd_gan_tpu.data.synthetic import make_dataset
from vfd_gan_tpu.ops.augment import staging_size
from vfd_gan_tpu.train.anogan_engine import AnoGanEngine, predict_forgery
from vfd_gan_tpu.train.ganomaly_engine import GanomalyEngine


@pytest.fixture(scope="module")
def loaders(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ag_vids"))
    return make_dataset(root, n_train=1, n_test=1, frames=16, size=40)


def _iters(cfg, train_list, test_list):
    train_ds = MdfVideoDataset(train_list, cfg.nfr,
                               staging=staging_size(cfg.isize))
    test_ds = MdfVideoDataset(test_list, cfg.nfr, staging=cfg.isize)
    return (ClipBatchIterator(train_ds, cfg.batchsize, seed=1),
            ClipBatchIterator(test_ds, cfg.batchsize, seed=1))


def test_predict_forgery_range():
    rng = np.random.default_rng(0)
    fake = rng.uniform(0, 1, (2, 3, 8, 8, 3)).astype(np.float32)
    real = rng.uniform(0, 1, (2, 3, 8, 8, 3)).astype(np.float32)
    out = np.asarray(predict_forgery(fake, real))
    assert out.shape == (2, 3, 8, 8, 1)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_anogan_end_to_end(loaders, tmp_path):
    train_list, test_list = loaders
    cfg = Config(model="anogan", ep=1, isize=32, nfr=8, batchsize=2, freq=2,
                 lr=2e-4, result_root=str(tmp_path), compute_dtype="float32",
                 tensorboard=False, tr_plist=train_list,
                 ts_plist=test_list).validate()
    eng = AnoGanEngine(cfg, *_iters(cfg, train_list, test_list))
    g0 = np.asarray(jax.tree_util.tree_leaves(eng.g_state.params)[0]).copy()
    eng.train()
    eng.close()
    g1 = np.asarray(jax.tree_util.tree_leaves(eng.g_state.params)[0])
    assert not np.allclose(g0, g1)
    assert np.isfinite(eng.errors["d/err_d/train"])
    assert np.isfinite(eng.errors["g/err_g/train"])
    assert "score/roc" in eng.scores


def test_ganomaly_end_to_end(loaders, tmp_path):
    train_list, test_list = loaders
    cfg = Config(model="ganomaly", ep=1, isize=32, nfr=8, batchsize=1, freq=2,
                 lr=2e-4, result_root=str(tmp_path), compute_dtype="float32",
                 tensorboard=False, tr_plist=train_list,
                 ts_plist=test_list).validate()
    eng = GanomalyEngine(cfg, *_iters(cfg, train_list, test_list))
    eng.train()
    eng.close()
    for tag in ("g/err_g_adv/train", "g/err_g_con/train", "g/err_g_enc/train",
                "d/err_d/train"):
        assert np.isfinite(eng.errors[tag])
    assert "score/roc" in eng.scores
    assert 0.0 <= eng.scores["score/roc"] <= 1.0
