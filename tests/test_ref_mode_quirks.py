"""--ref_mode_quirks fidelity mode (PARITY.md "train/eval-mode quirks").

The reference has two mode-handling bugs this flag replicates on demand:

* MyGAN.test never calls .eval() (models/mygannet.py:369-441) — the sweep
  runs G with dropout active and G/D BatchNorms normalising by batch stats
  AND mutating their running stats, which carry back into training.
* STCNN/AnoGAN test() calls .eval() and never switches back
  (lib/train_stcnn.py:143, models/anogan.py:145-147) — every training
  step after the FIRST periodic test runs without dropout and with
  frozen BN running stats.

Default behaviour (flag off) keeps the corrected semantics; these tests
pin the BN-stat mutation difference both ways.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from vfd_gan_tpu.cli.trainer import build_iterators
from vfd_gan_tpu.config import Config
from vfd_gan_tpu.data.synthetic import make_dataset


def _stats(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def _max_abs_diff(a, b):
    return max(float(np.max(np.abs(x - y))) for x, y in zip(a, b))


def test_validate_rejects_accum():
    with pytest.raises(ValueError, match="ref_mode_quirks"):
        Config(model="clstm", isize=16, nfr=8, batchsize=2, accum=2,
               ref_mode_quirks=True).validate()


def test_supervised_stuck_in_eval_freezes_bn(tmp_path):
    """After the first periodic test the quirk latch engages: training
    still moves params (grads flow through frozen BN) but BN running
    stats stop updating — exactly torch's model.eval() semantics."""
    from vfd_gan_tpu.train.supervised_engine import SupervisedEngine

    root = str(tmp_path / "vids")
    train_list, test_list = make_dataset(root, n_train=1, n_test=1,
                                         frames=16, size=32)
    cfg = Config(model="clstm", isize=16, nfr=8, batchsize=1, ep=1,
                 freq=2, ref_mode_quirks=True, result_root=str(tmp_path),
                 tensorboard=False, compute_dtype="float32",
                 tr_plist=train_list, ts_plist=test_list).validate()
    eng = SupervisedEngine(cfg, *build_iterators(cfg))
    from vfd_gan_tpu.parallel.mesh import shard_batch
    batch = shard_batch(eng.mesh, next(iter(eng.train_iter)))

    # pre-latch (global_step 1 <= freq): train mode, stats mutate
    eng.global_step = 1
    assert not eng.stuck_in_eval
    before = _stats(eng.state.batch_stats)
    eng._do_train_step(batch, jax.random.key(0))
    assert _max_abs_diff(before, _stats(eng.state.batch_stats)) > 0

    # post-latch (global_step > freq): eval mode, stats frozen, params move
    eng.global_step = cfg.freq + 1
    assert eng.stuck_in_eval
    frozen = _stats(eng.state.batch_stats)
    params_before = _stats(eng.state.params)
    eng._do_train_step(batch, jax.random.key(1))
    assert _max_abs_diff(frozen, _stats(eng.state.batch_stats)) == 0.0
    assert _max_abs_diff(params_before, _stats(eng.state.params)) > 0
    eng.close()


def test_supervised_default_keeps_training_mode(tmp_path):
    """Flag off: the latch never engages regardless of step count."""
    from vfd_gan_tpu.train.supervised_engine import SupervisedEngine

    root = str(tmp_path / "vids")
    train_list, test_list = make_dataset(root, n_train=1, n_test=1,
                                         frames=16, size=32)
    cfg = Config(model="clstm", isize=16, nfr=8, batchsize=1, ep=1,
                 freq=2, result_root=str(tmp_path), tensorboard=False,
                 compute_dtype="float32", tr_plist=train_list,
                 ts_plist=test_list).validate()
    eng = SupervisedEngine(cfg, *build_iterators(cfg))
    from vfd_gan_tpu.parallel.mesh import shard_batch
    batch = shard_batch(eng.mesh, next(iter(eng.train_iter)))
    eng.global_step = 10 ** 6
    assert not eng.stuck_in_eval
    before = _stats(eng.state.batch_stats)
    eng._do_train_step(batch, jax.random.key(0))
    assert _max_abs_diff(before, _stats(eng.state.batch_stats)) > 0
    eng.close()


def test_mygan_quirk_test_sweep_mutates_bn(tmp_path):
    """With the flag on, one test() sweep mutates BOTH G and D running
    stats and folds them back into the engine states (the reference's
    dropout-active/BN-mutating MyGAN.test)."""
    from vfd_gan_tpu.train.gan_engine import MyGanEngine

    root = str(tmp_path / "vids")
    train_list, test_list = make_dataset(root, n_train=1, n_test=1,
                                         frames=48, size=72,
                                         include_originals=False)
    cfg = Config(model="mygan", isize=64, nfr=16, batchsize=1, ep=1,
                 freq=10 ** 6, ngf=4, ndf=4, ref_mode_quirks=True,
                 result_root=str(tmp_path), tensorboard=False,
                 compute_dtype="float32",
                 tr_plist=train_list, ts_plist=test_list).validate()
    eng = MyGanEngine(cfg, *build_iterators(cfg))
    g_before = _stats(eng.g_state.batch_stats)
    d_before = _stats(eng.d_state.batch_stats)
    eng.test()
    assert _max_abs_diff(g_before, _stats(eng.g_state.batch_stats)) > 0
    assert _max_abs_diff(d_before, _stats(eng.d_state.batch_stats)) > 0
    eng.close()


def test_anogan_stuck_in_eval_freezes_bn(tmp_path):
    """AnoGAN post-latch training: both optimisers still step but none of
    the reference's three per-step BN stat mutations happen."""
    from vfd_gan_tpu.train.anogan_engine import AnoGanEngine

    root = str(tmp_path / "vids")
    train_list, test_list = make_dataset(root, n_train=1, n_test=1,
                                         frames=48, size=72,
                                         include_originals=False)
    cfg = Config(model="anogan", isize=64, nfr=16, batchsize=1, ep=1,
                 freq=2, ref_mode_quirks=True, result_root=str(tmp_path),
                 tensorboard=False, compute_dtype="float32",
                 tr_plist=train_list, ts_plist=test_list).validate()
    eng = AnoGanEngine(cfg, *build_iterators(cfg))
    from vfd_gan_tpu.parallel.mesh import shard_batch
    batch = shard_batch(eng.mesh, next(iter(eng.train_iter)))

    eng.global_step = cfg.freq + 1
    assert eng.stuck_in_eval
    g_stats = _stats(eng.g_state.batch_stats)
    d_stats = _stats(eng.d_state.batch_stats)
    g_params = _stats(eng.g_state.params)
    d_params = _stats(eng.d_state.params)
    eng._do_train_step(batch, jax.random.key(0))
    assert _max_abs_diff(g_stats, _stats(eng.g_state.batch_stats)) == 0.0
    assert _max_abs_diff(d_stats, _stats(eng.d_state.batch_stats)) == 0.0
    assert _max_abs_diff(g_params, _stats(eng.g_state.params)) > 0
    assert _max_abs_diff(d_params, _stats(eng.d_state.params)) > 0
    eng.close()
