"""Crash-recovery autosave: rolling 'latest' checkpoint during training."""

import os
import signal

from vfd_gan_tpu.config import Config
from vfd_gan_tpu.data.synthetic import make_dataset
from vfd_gan_tpu.cli.trainer import build_iterators
from vfd_gan_tpu.train.supervised_engine import SupervisedEngine


def test_autosave_writes_latest(tmp_path):
    root = str(tmp_path / "vids")
    train_list, test_list = make_dataset(root, n_train=1, n_test=1,
                                         frames=16, size=32)
    cfg = Config(model="clstm", isize=16, nfr=8, batchsize=1, ep=1,
                 freq=10 ** 6, autosave_every=2, result_root=str(tmp_path),
                 tensorboard=False, compute_dtype="float32",
                 tr_plist=train_list, ts_plist=test_list).validate()
    eng = SupervisedEngine(cfg, *build_iterators(cfg))
    eng.train()
    latest = os.path.join(eng.dirs.weights, "latest")
    assert os.path.isdir(latest)
    # resume from it
    cfg2 = Config(**{**cfg.__dict__, "resume": latest})
    eng2 = SupervisedEngine(cfg2, *build_iterators(cfg2))
    assert eng2.global_step == eng.global_step - eng.global_step % 2
    eng.close()
    eng2.close()


def test_sigterm_saves_latest_and_exits_cleanly(tmp_path):
    """Preemption safety: SIGTERM mid-epoch parks a resumable `latest`
    checkpoint (incl. exact-resume loop state) and train() returns instead
    of dying (SURVEY.md §5 failure recovery)."""
    root = str(tmp_path / "vids")
    train_list, test_list = make_dataset(root, n_train=1, n_test=1,
                                         frames=16, size=32)
    cfg = Config(model="clstm", isize=16, nfr=8, batchsize=1, ep=3,
                 freq=10 ** 6, result_root=str(tmp_path),
                 tensorboard=False, compute_dtype="float32",
                 tr_plist=train_list, ts_plist=test_list).validate()
    eng = SupervisedEngine(cfg, *build_iterators(cfg))

    orig_step = eng._do_train_step

    def step_then_sigterm(batch, key):
        out = orig_step(batch, key)
        if eng.global_step == 2:  # mimic an external preemption mid-epoch
            signal.raise_signal(signal.SIGTERM)
        return out

    eng._do_train_step = step_then_sigterm
    eng.train()  # returns cleanly (no exception, no process kill)
    assert eng.global_step == 2

    latest = os.path.join(eng.dirs.weights, "latest")
    assert os.path.isdir(latest)
    cfg2 = Config(**{**cfg.__dict__, "resume": latest})
    eng2 = SupervisedEngine(cfg2, *build_iterators(cfg2))
    assert eng2.global_step == 2
    assert eng2.batch_in_epoch == eng.batch_in_epoch
    eng.close()
    eng2.close()
    # default signal disposition restored after train()
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL


def test_async_autosave_writes_latest_and_resumes(tmp_path):
    """--autosave_async: the rolling `latest` is written by a background
    thread (single-flight), joined at loop exit, and restores exactly like
    the synchronous path."""
    root = str(tmp_path / "vids")
    train_list, test_list = make_dataset(root, n_train=1, n_test=1,
                                         frames=16, size=32)
    cfg = Config(model="clstm", isize=16, nfr=8, batchsize=1, ep=1,
                 freq=10 ** 6, autosave_every=2, autosave_async=True,
                 result_root=str(tmp_path), tensorboard=False,
                 compute_dtype="float32",
                 tr_plist=train_list, ts_plist=test_list).validate()
    eng = SupervisedEngine(cfg, *build_iterators(cfg))
    eng.train()                      # _wait_autosave joins the last write
    latest = os.path.join(eng.dirs.weights, "latest")
    assert os.path.isdir(latest)
    cfg2 = Config(**{**cfg.__dict__, "resume": latest})
    eng2 = SupervisedEngine(cfg2, *build_iterators(cfg2))
    # single-flight contract: a save is SKIPPED (not queued) while the
    # previous write is in flight, so under host load `latest` may be one
    # autosave_every stale — any positive autosave multiple <= final step
    # is correct (SIGTERM/exit paths do a synchronous final save instead)
    assert eng2.global_step in range(2, eng.global_step + 1, 2), \
        (eng2.global_step, eng.global_step)
    eng.close()
    eng2.close()
