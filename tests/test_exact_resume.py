"""Exact resume: kill-mid-epoch + resume reproduces the uninterrupted run's
metrics stream bit-for-bit (VERDICT.md round-1 Missing #4).

The reference dropped optimiser state and RNG on resume (SURVEY.md §5); the
rebuild checkpoints engine RNG key, epoch/batch cursor, iterator pass
counters and best-metric trackers alongside params/BN/Adam, and the data
iterator derives each pass's shuffle order purely from (seed, epoch), so an
interrupted run can be continued with an identical data/augmentation stream.
"""

import json
import os

import numpy as np
import pytest

from vfd_gan_tpu.cli.trainer import build_iterators
from vfd_gan_tpu.config import Config
from vfd_gan_tpu.data.synthetic import make_dataset
from vfd_gan_tpu.train.supervised_engine import SupervisedEngine


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("resume_vids"))
    return make_dataset(root, n_train=2, n_test=1, frames=24, size=32)


def _cfg(data, result_root, **kw):
    train_list, test_list = data
    base = dict(model="clstm", isize=16, nfr=8, batchsize=1, ep=2,
                freq=2, lr=1e-3, result_root=result_root, tensorboard=False,
                compute_dtype="float32", seed=3, workers=1,
                tr_plist=train_list, ts_plist=test_list)
    base.update(kw)
    return Config(**base).validate()


def _run(cfg):
    eng = SupervisedEngine(cfg, *build_iterators(cfg))
    eng.train()
    eng.close()
    recs = []
    with open(os.path.join(eng.dirs.root, "metrics.jsonl")) as f:
        for ln in f:
            r = json.loads(ln)
            r.pop("perf/steps_per_sec", None)  # wall-clock, not semantics
            recs.append(r)
    return eng, recs


def test_kill_midepoch_resume_is_bit_exact(data, tmp_path):
    # Uninterrupted run A.
    _, recs_a = _run(_cfg(data, str(tmp_path / "a")))
    assert len(recs_a) >= 3, "need several flushes to compare streams"

    # Run B: killed mid-epoch (max_steps inside epoch 1), then resumed.
    eng_b1, recs_b1 = _run(_cfg(data, str(tmp_path / "b1"),
                                max_steps=3, autosave_every=1))
    latest = os.path.join(eng_b1.dirs.weights, "latest")
    assert os.path.isdir(latest)
    eng_b2, recs_b2 = _run(_cfg(data, str(tmp_path / "b2"), resume=latest))

    # The resumed engine restored the exact cursor...
    assert eng_b2.global_step == recs_a[-1]["step"]

    # ...and the concatenated metric stream matches A bit-for-bit.
    recs_b = recs_b1 + recs_b2
    assert [r["step"] for r in recs_b] == [r["step"] for r in recs_a]
    for ra, rb in zip(recs_a, recs_b):
        assert set(ra) == set(rb), (ra, rb)
        for k in ra:
            np.testing.assert_array_equal(ra[k], rb[k], err_msg=k)


def test_iterator_state_roundtrip(data):
    """Shuffle order is a pure function of (seed, epoch); skip_batches
    fast-forwards within a pass."""
    cfg = _cfg(data, "unused")
    train_iter, _ = build_iterators(cfg)
    full = [b["data"] for b in train_iter]          # pass 0
    assert train_iter.epoch == 1
    train_iter.epoch = 0
    train_iter.skip_batches = 1
    tail = [b["data"] for b in train_iter]          # pass 0, resumed at 1
    assert len(tail) == len(full) - 1
    for a, b in zip(full[1:], tail):
        np.testing.assert_array_equal(a, b)
