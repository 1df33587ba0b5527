"""Pipeline-parallel Xception engine path (--pp) on the virtual mesh.

Contract (SURVEY.md §4 distributed-test strategy; the reference has no
pipeline parallelism — SURVEY.md §2.3): the stage-sharded GPipe step equals
the unpipelined single-mesh step on the same batch, state stays
stage-sharded on device, and checkpoints interchange with non-pp runs via
the canonical middle1..middle8 layout.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from vfd_gan_tpu.config import Config
from vfd_gan_tpu.ops.augment import staging_size
from vfd_gan_tpu.parallel.mesh import shard_batch
from vfd_gan_tpu.train.supervised_engine import SupervisedEngine

XW = 0.02  # narrow trunk (728 -> 15 channels): CPU-harness friendly


def _cfg(tmp_path, **kw):
    base = dict(model="xception", isize=32, nfr=8, batchsize=2, ep=1,
                freq=10 ** 6, lr=1e-3, xwidth=XW, seed=7, dp=1,
                compute_dtype="float32", tensorboard=False,
                result_root=str(tmp_path))
    base.update(kw)
    return Config(**base).validate()


def _batch(cfg, seed=0, size=None):
    rng = np.random.default_rng(seed)
    s = size if size is not None else staging_size(cfg.isize)
    return {
        "data": rng.integers(0, 255, (cfg.batchsize, cfg.nfr, s, s, 3),
                             dtype=np.uint8),
        "real": rng.integers(0, 255, (cfg.batchsize, cfg.nfr, s, s, 3),
                             dtype=np.uint8),
        "mask": rng.integers(0, 2, (cfg.batchsize, cfg.nfr, s, s, 1),
                             dtype=np.uint8) * np.uint8(255),
        "label": np.ones((cfg.batchsize, cfg.nfr), np.float32),
    }


def _one_step(cfg):
    eng = SupervisedEngine(cfg, train_iter=None, test_iter=None)
    batch = shard_batch(eng.mesh, _batch(cfg))
    state, loss, _ = eng._train_step(eng.state, batch, jax.random.key(3))
    # test batches arrive pre-resized to isize (lib/data.py:132-135)
    ebatch = shard_batch(eng.mesh, _batch(cfg, seed=1, size=cfg.isize))
    pred = np.asarray(eng._eval_step(state, ebatch)[2])
    if eng.pipe is not None:
        from vfd_gan_tpu.parallel.pp_xception import unstack_state
        state = unstack_state(state)
    params = jax.device_get(
        jax.tree_util.tree_leaves(
            {"p": state.params, "s": state.batch_stats}))
    eng.close()
    return float(loss), params, pred


@pytest.mark.parametrize("pp_kw", [dict(pp=2, pp_micro=1),
                                   dict(pp=4, pp_micro=1)])
def test_pp_matches_unpipelined(tmp_path, pp_kw):
    """Pure inter-layer model parallelism (one microbatch) is exactly the
    sequential step: same loss, same updated params/BN stats, same eval."""
    if len(jax.devices()) < pp_kw["pp"]:
        pytest.skip(f"need {pp_kw['pp']} devices")
    loss1, params1, pred1 = _one_step(_cfg(tmp_path))
    loss2, params2, pred2 = _one_step(_cfg(tmp_path, **pp_kw))
    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
    for a, b in zip(params1, params2):
        np.testing.assert_allclose(a, b, atol=2e-5)
    np.testing.assert_allclose(pred1, pred2, atol=1e-5)


def test_dp2_pp2_matches_unpipelined(tmp_path):
    """dp x pp composition: microbatches shard over dp and the stage blocks'
    BN reduces over it (lax.pmean) — still the global-batch step."""
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    loss1, params1, pred1 = _one_step(_cfg(tmp_path))
    loss2, params2, pred2 = _one_step(_cfg(tmp_path, pp=2, pp_micro=1, dp=2))
    # cross-device reduction-order float noise: same tolerance as
    # test_dp_equivalence's dp4-vs-dp1 checks
    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
    for a, b in zip(params1, params2):
        np.testing.assert_allclose(a, b, atol=1e-4)
    np.testing.assert_allclose(pred1, pred2, atol=1e-4)


def test_pp_microbatched_runs_and_state_is_sharded(tmp_path):
    """pp=2 with 2 GPipe microbatches: finite losses, and the stacked
    middle-block state actually lives split over the pp axis."""
    if len(jax.devices()) < 2:
        pytest.skip("need 2 devices")
    cfg = _cfg(tmp_path, pp=2, pp_micro=2, batchsize=4)
    eng = SupervisedEngine(cfg, train_iter=None, test_iter=None)
    from vfd_gan_tpu.parallel.pp_xception import STACKED
    leaf = jax.tree_util.tree_leaves(eng.state.params[STACKED])[0]
    assert leaf.sharding.spec[0] == "pp"
    assert leaf.sharding.shard_shape(leaf.shape)[0] == leaf.shape[0] // 2
    batch = shard_batch(eng.mesh, _batch(cfg))
    before = jax.device_get(eng.state.params[STACKED])  # step donates state
    state, loss, _ = eng._train_step(eng.state, batch, jax.random.key(3))
    assert np.isfinite(float(loss))
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        before, jax.device_get(state.params[STACKED]))
    assert all(jax.tree_util.tree_leaves(changed))
    eng.close()


def test_pp_checkpoint_is_canonical(tmp_path):
    """A --pp checkpoint has the same tree as a non-pp one (interchange),
    and stack/unstack round-trips exactly."""
    if len(jax.devices()) < 2:
        pytest.skip("need 2 devices")
    from vfd_gan_tpu.parallel.pp_xception import stack_state, unstack_state
    eng_pp = SupervisedEngine(_cfg(tmp_path, pp=2, pp_micro=1),
                              train_iter=None, test_iter=None)
    eng_1 = SupervisedEngine(_cfg(tmp_path), train_iter=None, test_iter=None)
    canon = eng_pp._ckpt_tree()["state"]
    assert (jax.tree_util.tree_structure(canon)
            == jax.tree_util.tree_structure(eng_1.state))
    rt = stack_state(unstack_state(eng_pp.state))
    for a, b in zip(jax.tree_util.tree_leaves(rt),
                    jax.tree_util.tree_leaves(eng_pp.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # same seed => the pp engine's canonicalised init equals the plain init
    for a, b in zip(jax.tree_util.tree_leaves(canon.params),
                    jax.tree_util.tree_leaves(eng_1.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    eng_pp.close()
    eng_1.close()
