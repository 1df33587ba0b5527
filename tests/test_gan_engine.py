"""MyGAN engine: fused G+D step semantics + end-to-end integration."""

import os

import jax
import numpy as np
import pytest

from vfd_gan_tpu.config import Config
from vfd_gan_tpu.data import ClipBatchIterator, MdfVideoDataset
from vfd_gan_tpu.data.synthetic import make_dataset
from vfd_gan_tpu.ops.augment import staging_size
from vfd_gan_tpu.train.gan_engine import MyGanEngine


@pytest.fixture(scope="module")
def loaders(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gan_vids"))
    # nfr=16 required by the U-Net's four temporal halvings.  size == isize
    # (64): the test split must not resize the GT, or the 1-px Canny-edge
    # labels go fractional and the reference's int32 cast truncates them
    # all to 0 — a single-class sweep that (correctly) skips checkpointing.
    return make_dataset(root, n_train=1, n_test=1, frames=32, size=64,
                        include_originals=False)


def _cfg(tmp_path, train_list, test_list, **kw):
    # isize=64: the smallest size the SpatialDisc's six halvings support
    base = dict(model="mygan", ep=1, isize=64, nfr=16, batchsize=1, freq=2,
                lr=1e-3, ngf=4, ndf=4, result_root=str(tmp_path),
                compute_dtype="float32",
                tensorboard=False, tr_plist=train_list, ts_plist=test_list)
    base.update(kw)
    return Config(**base).validate()


def _iters(cfg, train_list, test_list):
    train_ds = MdfVideoDataset(train_list, cfg.nfr,
                               staging=staging_size(cfg.isize))
    test_ds = MdfVideoDataset(test_list, cfg.nfr, staging=cfg.isize)
    return (ClipBatchIterator(train_ds, cfg.batchsize, seed=1),
            ClipBatchIterator(test_ds, cfg.batchsize, seed=1))


def test_mygan_end_to_end(loaders, tmp_path):
    train_list, test_list = loaders
    cfg = _cfg(tmp_path, train_list, test_list)
    eng = MyGanEngine(cfg, *_iters(cfg, train_list, test_list))
    g_before = jax.tree_util.tree_leaves(eng.g_state.params)[0].copy()
    d_before = jax.tree_util.tree_leaves(eng.d_state.params)[0].copy()
    eng.train()
    eng.close()

    # both nets actually trained
    g_after = jax.tree_util.tree_leaves(eng.g_state.params)[0]
    d_after = jax.tree_util.tree_leaves(eng.d_state.params)[0]
    assert not np.allclose(np.asarray(g_before), np.asarray(g_after))
    assert not np.allclose(np.asarray(d_before), np.asarray(d_after))

    # telemetry matches the reference tag set
    for tag in ("g/err_g/train", "g/err_g_adv_s/train", "g/err_g_con/train",
                "d/err_d/train", "d/err_d_real_s/train",
                "g/err_g_con/test", "d/err_d/test"):
        assert tag in eng.errors, tag
        assert np.isfinite(eng.errors[tag])
    assert "score/roc" in eng.scores
    # paired G/D checkpoint saved on first improvement
    assert os.listdir(eng.dirs.weights)


def test_gt_flow_cache_sweep_matches_uncached(loaders, tmp_path):
    """--cache_gt_flow: the first sweep populates the per-clip gt-flow
    cache, later sweeps reuse it through the cached eval step and must
    reproduce the uncached sweep's scores exactly and its D/G telemetry to
    float tolerance (PARITY.md "gt-flow cache")."""
    train_list, test_list = loaders
    cfg = _cfg(tmp_path, train_list, test_list, freq=10 ** 6,
               cache_gt_flow=True)
    eng = MyGanEngine(cfg, *_iters(cfg, train_list, test_list))
    try:
        r1 = eng.test()                      # populates (uncached path)
        assert len(eng._gt_flow_cache) == len(eng.test_iter.dataset)
        errs1 = {k: v for k, v in eng.errors.items() if k.endswith("/test")}
        assert errs1

        calls = []
        orig = eng._eval_step
        eng._eval_step = lambda *a: (calls.append(1), orig(*a))[1]
        r2 = eng.test()                      # cached path only
        assert not calls, "cached sweep fell back to the uncached step"
        assert r1 == pytest.approx(r2, rel=1e-5)
        for k, v in errs1.items():
            assert eng.errors[k] == pytest.approx(v, rel=1e-4, abs=1e-5), k
    finally:
        eng.close()


def test_ae_generator_swap_one_step(loaders, tmp_path):
    """--ae swaps the U-Net for the (2+1)D AutoEncoder as G
    (models/mygannet.py:224-230); one fused step must run and update it."""
    train_list, test_list = loaders
    cfg = _cfg(tmp_path, train_list, test_list, ae=True, freq=10 ** 6)
    eng = MyGanEngine(cfg, *_iters(cfg, train_list, test_list))
    assert type(eng.netg).__name__ == "AutoEncoder"
    batch = next(iter(eng.train_iter))
    from vfd_gan_tpu.parallel.mesh import shard_batch
    g0 = np.asarray(jax.tree_util.tree_leaves(eng.g_state.params)[0]).copy()
    metrics, _ = eng._do_train_step(shard_batch(eng.mesh, batch),
                                    jax.random.key(5))
    assert np.isfinite(float(metrics["g/err_g_con/train"]))
    g1 = np.asarray(jax.tree_util.tree_leaves(eng.g_state.params)[0])
    assert not np.allclose(g0, g1)
    eng.close()


def test_adv_term_has_no_generator_gradient(loaders, tmp_path):
    """The adversarial feature-matching loss must not train G (detached
    inputs, models/mygannet.py:279-286): G updates are identical whether
    w_adv is 0 or huge."""
    train_list, test_list = loaders
    outs = {}
    for w_adv in (0.0, 1000.0):
        cfg = _cfg(tmp_path, train_list, test_list, w_adv=w_adv, freq=10**6)
        eng = MyGanEngine(cfg, *_iters(cfg, train_list, test_list))
        batch = next(iter(eng.train_iter))
        key = jax.random.key(123)
        g2, _, _, _ = eng._train_step(eng.g_state, eng.d_state,
                                      {k: jax.numpy.asarray(v)
                                       for k, v in batch.items()}, key)
        outs[w_adv] = np.asarray(jax.tree_util.tree_leaves(g2.params)[0])
        eng.close()
    np.testing.assert_array_equal(outs[0.0], outs[1000.0])
