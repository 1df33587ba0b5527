"""--accum gradient accumulation: k sequential microbatches, averaged
grads, ONE optimiser step, per-microbatch BN stat chaining (the torch-user
contract "run at batchsize/k, step every k"; extension — no reference
equivalent).  Semantics contract in train/gan_engine._gan_core_accum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfd_gan_tpu.config import Config
from vfd_gan_tpu.train.gan_engine import MyGanEngine
from vfd_gan_tpu.train.supervised_engine import SupervisedEngine

rng = np.random.default_rng(11)


def _batch(b, t, s):
    return {
        "data": rng.integers(0, 255, (b, t, s, s, 3)).astype(np.uint8),
        "real": rng.integers(0, 255, (b, t, s, s, 3)).astype(np.uint8),
        "mask": (rng.integers(0, 2, (b, t, s, s, 1)) * 255).astype(np.uint8),
        "label": np.ones((b, t), np.float32),
    }


def test_gan_accum2_matches_manual_two_microbatch_reference(tmp_path):
    from vfd_gan_tpu.ops.augment import augment_clips, staging_size

    cfg = Config(model="mygan", isize=64, nfr=16, batchsize=2, accum=2,
                 ngf=4, ndf=4, ep=1, compute_dtype="float32",
                 tensorboard=False, result_root=str(tmp_path)).validate()
    eng = MyGanEngine(cfg, train_iter=None, test_iter=None)
    # cheap deterministic flow stand-in (the accumulation contract under
    # test is flow-implementation independent; Farneback dominates the CPU
    # test runtime)
    eng._flow = lambda v, streams=1: jnp.tanh(v)
    # SGD(1.0) instead of Adam: post-step params become params - avg_grads,
    # LINEAR in the gradients.  Adam's first step is ~sign(g)*lr, so sub-ulp
    # cross-compilation grad differences flip updates by 2*lr (measured) —
    # and it normalises away a sum-vs-average accumulation bug entirely.
    import optax

    from vfd_gan_tpu.train.state import NetState
    eng.tx_g = eng.tx_d = optax.sgd(1.0)
    eng.g_state = NetState.create(eng.g_state.variables(), eng.tx_g)
    eng.d_state = NetState.create(eng.d_state.variables(), eng.tx_d)
    batch = jax.tree_util.tree_map(
        jnp.asarray, _batch(2, 16, staging_size(64)))
    key = jax.random.key(3)

    # manual reference: same augmentation, two sequential _gan_grads with
    # chained BN stats, averaged grads, one apply per net
    aug_key, drop_key = jax.random.split(key)
    data, real, gt = augment_clips(aug_key, batch["data"], batch["real"],
                                   batch["mask"], cfg.isize)
    keys = jax.random.split(drop_key, 2)
    g_bs, d_bs = eng.g_state.batch_stats, eng.d_state.batch_stats
    gacc = dacc = None
    for i in range(2):
        g_gr, d_gr, g_bs, d_bs, _, _ = jax.jit(eng._gan_grads)(
            eng.g_state.params, g_bs, eng.d_state.params, d_bs,
            data[i:i + 1], gt[i:i + 1], keys[i])
        gacc = g_gr if gacc is None else jax.tree_util.tree_map(
            jnp.add, gacc, g_gr)
        dacc = d_gr if dacc is None else jax.tree_util.tree_map(
            jnp.add, dacc, d_gr)
    g_want = eng.g_state.apply_grads(
        eng.tx_g, jax.tree_util.tree_map(lambda x: x / 2, gacc), g_bs)
    d_want = eng.d_state.apply_grads(
        eng.tx_d, jax.tree_util.tree_map(lambda x: x / 2, dacc), d_bs)

    g_got, d_got, metrics, viz = jax.jit(eng._train_step_impl)(
        eng.g_state, eng.d_state, batch, key)

    # Tolerances calibrated to measured cross-compilation noise: the scan
    # body and the standalone _gan_grads jit schedule their f32 reduction
    # trees differently, and early-layer kernel grads (near-cancelling sums
    # over ~1e5 products) diverge up to ~6% relative (abs ~3e-4) between
    # the two programs.  The wiring bugs this test exists to catch —
    # summed-not-averaged grads (2x = rel 1.0), unsplit microbatch data,
    # swapped trees/keys — are all far above this; the EXACT accumulation
    # semantics (grads averaged, BN stats chained, rtol 2e-5) are pinned by
    # the single-compiled-program supervised case below, which shares the
    # same scan pattern.
    for want, got in ((g_want, g_got), (d_want, d_got)):
        for w, g in zip(jax.tree_util.tree_leaves(want.params),
                        jax.tree_util.tree_leaves(got.params)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-1, atol=5e-4)
        for w, g in zip(jax.tree_util.tree_leaves(want.batch_stats),
                        jax.tree_util.tree_leaves(got.batch_stats)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-1, atol=5e-4)
    # viz panels restore the full batch, metrics stay scalar
    assert viz["pred"].shape[0] == 2
    assert np.asarray(metrics["g/err_g/train"]).shape == ()
    eng.close()


def test_supervised_accum2_matches_manual_reference(tmp_path):
    from vfd_gan_tpu.ops.augment import augment_clips, staging_size
    from vfd_gan_tpu.ops.losses import bce

    cfg = Config(model="clstm", isize=32, nfr=8, batchsize=2, accum=2,
                 ep=1, compute_dtype="float32", tensorboard=False,
                 result_root=str(tmp_path)).validate()
    eng = SupervisedEngine(cfg, train_iter=None, test_iter=None)
    # SGD(1.0): post-step params linear in the averaged grads (see the GAN
    # case above for why Adam is the wrong comparison optimiser here)
    import optax

    from vfd_gan_tpu.train.state import NetState
    eng.tx = optax.sgd(1.0)
    eng.state = NetState.create(eng.state.variables(), eng.tx)
    batch = jax.tree_util.tree_map(
        jnp.asarray, _batch(2, 8, staging_size(32)))
    key = jax.random.key(5)

    aug_key, drop_key = jax.random.split(key)
    data, real, gt = augment_clips(aug_key, batch["data"], batch["real"],
                                   batch["mask"], cfg.isize)
    keys = jax.random.split(drop_key, 2)

    def one(params, bstats, data_i, gt_i, key_i):
        def loss_fn(p):
            pred, mut = eng.model.apply(
                {"params": p, "batch_stats": bstats}, data_i, True,
                mutable=["batch_stats"], rngs={"dropout": key_i})
            return bce(pred, gt_i), mut["batch_stats"]

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    bstats, gacc = eng.state.batch_stats, None
    for i in range(2):
        (loss_i, bstats), grads_i = jax.jit(one)(
            eng.state.params, bstats, data[i:i + 1], gt[i:i + 1], keys[i])
        gacc = grads_i if gacc is None else jax.tree_util.tree_map(
            jnp.add, gacc, grads_i)
    want = eng.state.apply_grads(
        eng.tx, jax.tree_util.tree_map(lambda x: x / 2, gacc), bstats)

    got, loss, viz = jax.jit(eng._train_step_impl)(eng.state, batch, key)
    for w, g in zip(jax.tree_util.tree_leaves(want.params),
                    jax.tree_util.tree_leaves(got.params)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=1e-6)
    assert viz["pred"].shape[0] == 2
    eng.close()


def test_accum_config_validation(tmp_path):
    with pytest.raises(ValueError):
        Config(model="mygan", batchsize=4, accum=3,
               result_root=str(tmp_path)).validate()
    with pytest.raises(ValueError):
        Config(model="anogan", batchsize=4, accum=2,
               result_root=str(tmp_path)).validate()
