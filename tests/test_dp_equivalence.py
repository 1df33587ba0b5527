"""DP-sharded step == single-device step on the same batch (SURVEY.md §4
distributed-test strategy), plus init-distribution checks."""

import jax
import numpy as np
import pytest

from vfd_gan_tpu.config import Config
from vfd_gan_tpu.data.synthetic import make_dataset
from vfd_gan_tpu.cli.trainer import build_iterators
from vfd_gan_tpu.train.supervised_engine import SupervisedEngine


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dp_vids"))
    return make_dataset(root, n_train=2, n_test=1, frames=16, size=32)


def test_dp4_matches_dp1(data, tmp_path):
    train_list, test_list = data
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")

    results = {}
    for dp in (1, 4):
        cfg = Config(model="clstm", isize=16, nfr=8, batchsize=4, ep=1,
                     freq=10 ** 6, dp=dp, lr=1e-3,
                     result_root=str(tmp_path), tensorboard=False,
                     compute_dtype="float32", seed=7,
                     tr_plist=train_list, ts_plist=test_list).validate()
        eng = SupervisedEngine(cfg, *build_iterators(cfg))
        batch = next(iter(eng.train_iter))
        from vfd_gan_tpu.parallel.mesh import shard_batch
        state, loss, _ = eng._train_step(
            eng.state, shard_batch(eng.mesh, batch), jax.random.key(3))
        results[dp] = (float(loss),
                       [np.asarray(x) for x in
                        jax.tree_util.tree_leaves(jax.device_get(state.params))])
        eng.close()

    # GSPMD data parallelism computes *global* batch statistics and a global
    # gradient mean — equal to the single-device step up to cross-device
    # reduction-order float noise.
    np.testing.assert_allclose(results[1][0], results[4][0], rtol=1e-5)
    for a, b in zip(results[1][1], results[4][1]):
        np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.parametrize("flow_scale", [0.5, 1.0])
def test_gan_dp4_matches_dp1(tmp_path, tmp_path_factory, flow_scale):
    """The fused MyGAN step (two optimisers, sequential D BN updates,
    on-device flow) is DP-invariant: dp4 == dp1 on the same global batch
    (VERDICT.md round-1 Weak #4) — at BOTH flow scales, with tolerances
    calibrated from a measured dp2 noise yardstick instead of constants
    pinned to one config (VERDICT r3 weak-7 / item 8; rationale in
    parallel/verify.py).  Round-3 history for the old constants: dp4
    reassociates BN batch statistics (max ~4e-4 rel on loss scalars with
    the two-pass variance; the one-pass E[x^2]-E[x]^2 form cancelled
    catastrophically on near-constant mask channels, 2e-2) while a
    semantic DP bug diverges by O(weight scale 0.02)."""
    from vfd_gan_tpu.parallel.verify import assert_replica_equivalence
    from vfd_gan_tpu.train.gan_engine import MyGanEngine

    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    root = str(tmp_path_factory.mktemp("gan_dp_vids"))
    train_list, test_list = make_dataset(root, n_train=2, n_test=1,
                                         frames=48, size=72,
                                         include_originals=False)

    results = {}
    for dp in (1, 2, 4):
        cfg = Config(model="mygan", isize=64, nfr=16, batchsize=4, ep=1,
                     freq=10 ** 6, dp=dp, lr=1e-4, ngf=4, ndf=4,
                     flow_scale=flow_scale,
                     result_root=str(tmp_path), tensorboard=False,
                     compute_dtype="float32", seed=7,
                     tr_plist=train_list, ts_plist=test_list).validate()
        eng = MyGanEngine(cfg, *build_iterators(cfg))
        batch = next(iter(eng.train_iter))
        from vfd_gan_tpu.parallel.mesh import shard_batch
        g_state, d_state, metrics, _ = eng._train_step(
            eng.g_state, eng.d_state, shard_batch(eng.mesh, batch),
            jax.random.key(3))
        results[dp] = (
            {k: float(v) for k, v in metrics.items()},
            [np.asarray(x) for x in jax.tree_util.tree_leaves(
                jax.device_get((g_state.params, d_state.params,
                                d_state.batch_stats)))])
        eng.close()

    rtol, atol = assert_replica_equivalence(
        results[1], results[2], results[4], label=f"fs{flow_scale}")
    print(f"dp gate fs{flow_scale}: calibrated rtol={rtol:.2e} "
          f"atol={atol:.2e}")


def test_gan_dp2_sp2_matches_dp1(tmp_path, tmp_path_factory):
    """2-D (dp x sp) mesh: the fused MyGAN step with the frame axis sharded
    over sp (GSPMD-partitioned temporal convs / BN stats / flow) matches the
    unsharded step on the same global batch."""
    from vfd_gan_tpu.train.gan_engine import MyGanEngine

    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    root = str(tmp_path_factory.mktemp("gan_sp_vids"))
    # n_test=2 -> 6 test windows -> one full drop-last eval batch of 4
    train_list, test_list = make_dataset(root, n_train=2, n_test=2,
                                         frames=48, size=72,
                                         include_originals=False)

    results = {}
    for dp, sp in ((1, 1), (2, 2)):
        # flow_scale=1.0: see test_gan_dp4_matches_dp1
        cfg = Config(model="mygan", isize=64, nfr=16, batchsize=4, ep=1,
                     freq=10 ** 6, dp=dp, sp=sp, lr=1e-4, ngf=4, ndf=4,
                     flow_scale=1.0,
                     result_root=str(tmp_path), tensorboard=False,
                     compute_dtype="float32", seed=7,
                     tr_plist=train_list, ts_plist=test_list).validate()
        eng = MyGanEngine(cfg, *build_iterators(cfg))
        assert dict(eng.mesh.shape) == (
            {"dp": 2, "sp": 2} if sp == 2 else {"dp": 1})
        batch = next(iter(eng.train_iter))
        from vfd_gan_tpu.parallel.mesh import shard_batch
        g_state, d_state, metrics, _ = eng._train_step(
            eng.g_state, eng.d_state, shard_batch(eng.mesh, batch),
            jax.random.key(3))
        results[(dp, sp)] = (
            {k: float(v) for k, v in metrics.items()},
            [np.asarray(x) for x in jax.tree_util.tree_leaves(
                jax.device_get((g_state.params, d_state.params,
                                d_state.batch_stats)))])
        if sp == 2:
            # the eval path (no-augment normalise, eval-mode dual D, flow)
            # must also run under the 2-D mesh — exercised via one full
            # periodic sweep.  _train_step donated the old state buffers,
            # so hand the engine the updated states first (the training
            # loop does the same reassignment).
            eng.g_state, eng.d_state = g_state, d_state
            eng.test()
            assert np.isfinite(eng.errors["g/err_g_con/test"])
        eng.close()

    # Same tolerance rationale as test_gan_dp4_matches_dp1 above.
    m1, m2 = results[(1, 1)][0], results[(2, 2)][0]
    assert set(m1) == set(m2)
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-3, atol=1e-6,
                                   err_msg=k)
    for a, b in zip(results[(1, 1)][1], results[(2, 2)][1]):
        np.testing.assert_allclose(a, b, atol=4e-4)


def test_gan_dp2_tp2_matches_dp1(tmp_path, tmp_path_factory):
    """2-D (dp x tp) mesh: the fused MyGAN step with every network's
    channel axis sharded over tp (Megatron-style column sharding of
    params, Adam moments and BN state; GSPMD activation collectives)
    matches the unsharded step on the same global batch — and the state
    really is channel-sharded (per-device param memory ~1/tp)."""
    from vfd_gan_tpu.train.gan_engine import MyGanEngine

    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    root = str(tmp_path_factory.mktemp("gan_tp_vids"))
    train_list, test_list = make_dataset(root, n_train=2, n_test=1,
                                         frames=48, size=72,
                                         include_originals=False)

    results = {}
    for dp, tp in ((1, 1), (2, 2)):
        # flow_scale=1.0: see test_gan_dp4_matches_dp1
        cfg = Config(model="mygan", isize=64, nfr=16, batchsize=4, ep=1,
                     freq=10 ** 6, dp=dp, tp=tp, lr=1e-4, ngf=4, ndf=4,
                     flow_scale=1.0,
                     result_root=str(tmp_path), tensorboard=False,
                     compute_dtype="float32", seed=7,
                     tr_plist=train_list, ts_plist=test_list).validate()
        eng = MyGanEngine(cfg, *build_iterators(cfg))
        assert dict(eng.mesh.shape) == (
            {"dp": 2, "tp": 2} if tp == 2 else {"dp": 1})
        if tp == 2:
            # divisible channel axes must actually be tp-sharded on device
            from jax.sharding import PartitionSpec as P
            flat = jax.tree_util.tree_flatten_with_path(eng.g_state.params)[0]
            sharded = [p for path, p in flat
                       if p.ndim >= 1 and p.shape[-1] % 2 == 0 and p.shape[-1]]
            assert sharded, "no shardable params found"
            for p in sharded:
                spec = p.sharding.spec
                assert spec[-1] == "tp", (p.shape, spec)
        batch = next(iter(eng.train_iter))
        from vfd_gan_tpu.parallel.mesh import shard_batch
        g_state, d_state, metrics, _ = eng._train_step(
            eng.g_state, eng.d_state, shard_batch(eng.mesh, batch),
            jax.random.key(3))
        results[(dp, tp)] = (
            {k: float(v) for k, v in metrics.items()},
            [np.asarray(x) for x in jax.tree_util.tree_leaves(
                jax.device_get((g_state.params, d_state.params,
                                d_state.batch_stats)))])
        eng.close()

    # Same tolerance rationale as test_gan_dp4_matches_dp1 above (tp only
    # re-tiles the channel axis of each contraction; reduction order over
    # the unsharded Cin/batch dims is nearly unchanged).
    m1, m2 = results[(1, 1)][0], results[(2, 2)][0]
    assert set(m1) == set(m2)
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-3, atol=1e-6,
                                   err_msg=k)
    for a, b in zip(results[(1, 1)][1], results[(2, 2)][1]):
        np.testing.assert_allclose(a, b, atol=4e-4)


def test_anogan_dp4_matches_dp1(tmp_path, tmp_path_factory):
    """AnoGAN's D-then-updated-D step (z-sampling, two optimisers) is
    DP-invariant — the last engine without a DP-equivalence proof."""
    from vfd_gan_tpu.train.anogan_engine import AnoGanEngine

    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    root = str(tmp_path_factory.mktemp("anogan_dp_vids"))
    train_list, test_list = make_dataset(root, n_train=2, n_test=1,
                                         frames=48, size=72,
                                         include_originals=False)

    results = {}
    for dp in (1, 4):
        cfg = Config(model="anogan", isize=64, nfr=16, batchsize=4, ep=1,
                     freq=10 ** 6, dp=dp, lr=1e-4, result_root=str(tmp_path),
                     tensorboard=False, compute_dtype="float32", seed=7,
                     tr_plist=train_list, ts_plist=test_list).validate()
        eng = AnoGanEngine(cfg, *build_iterators(cfg))
        batch = next(iter(eng.train_iter))
        from vfd_gan_tpu.parallel.mesh import shard_batch
        g_state, d_state, metrics, _ = eng._train_step(
            eng.g_state, eng.d_state, shard_batch(eng.mesh, batch),
            jax.random.key(3))
        results[dp] = (
            {k: float(v) for k, v in metrics.items()},
            [np.asarray(x) for x in jax.tree_util.tree_leaves(
                jax.device_get(g_state.params))],
            [np.asarray(x) for x in jax.tree_util.tree_leaves(
                jax.device_get(d_state.params))],
            [np.asarray(x) for x in jax.tree_util.tree_leaves(
                jax.device_get(d_state.batch_stats))])
        eng.close()

    m1, m4 = results[1][0], results[4][0]
    for k in m1:
        np.testing.assert_allclose(m1[k], m4[k], rtol=1e-3, atol=1e-6,
                                   err_msg=k)
    # Params: Adam's first step moves each weight by <= ~its lr, so
    # reduction noise can at worst flip a near-zero gradient's update sign
    # (2*lr envelope) while a semantic DP bug diverges by O(weight scale
    # 0.02).  AnoGAN trains G at 5x the base lr (reference quirk,
    # anogan_engine.py) and its adversarial G gradients are tiny at init,
    # so broad sign flips at the 2 * 5e-4 envelope are expected and benign
    # (measured: diffs saturate at exactly 1.00e-3, never beyond).
    for a, b in zip(results[1][1], results[4][1]):
        np.testing.assert_allclose(a, b, atol=1.25e-3)
    for a, b in zip(results[1][2], results[4][2]):
        np.testing.assert_allclose(a, b, atol=2.5e-4)
    # BN running stats fold momentum * batch_var; the generated video has
    # near-constant channels whose variance reductions reassociate under
    # dp4, and the step's THIRD D stats pass (the G-step forward,
    # anogan.py:247) runs downstream of the LeakyReLU(64) slope typo whose
    # x64 amplification makes the large var entries absolutely noisy while
    # staying relatively tight (measured max 2.4e-2 abs on O(10) vars).
    # Unsynced per-replica stats — the failure mode this test exists for —
    # would differ by O(0.1-1) on the small-valued means too.
    for a, b in zip(results[1][3], results[4][3]):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=5e-3)


def test_ganomaly_dp4_matches_dp1(tmp_path, tmp_path_factory):
    """GANomaly's enc-dec-enc step (feature-matching G loss, per-frame D)
    is DP-invariant — completes the engine DP-equivalence matrix."""
    from vfd_gan_tpu.train.ganomaly_engine import GanomalyEngine

    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    root = str(tmp_path_factory.mktemp("gano_dp_vids"))
    train_list, test_list = make_dataset(root, n_train=2, n_test=1,
                                         frames=48, size=72,
                                         include_originals=False)

    results = {}
    for dp in (1, 4):
        cfg = Config(model="ganomaly", isize=64, nfr=16, batchsize=4, ep=1,
                     freq=10 ** 6, dp=dp, lr=1e-4, result_root=str(tmp_path),
                     tensorboard=False, compute_dtype="float32", seed=7,
                     tr_plist=train_list, ts_plist=test_list).validate()
        eng = GanomalyEngine(cfg, *build_iterators(cfg))
        batch = next(iter(eng.train_iter))
        from vfd_gan_tpu.parallel.mesh import shard_batch
        g_state, d_state, metrics, _ = eng._train_step(
            eng.g_state, eng.d_state, shard_batch(eng.mesh, batch),
            jax.random.key(3))
        results[dp] = (
            {k: float(v) for k, v in metrics.items()},
            [np.asarray(x) for x in jax.tree_util.tree_leaves(
                jax.device_get((g_state.params, d_state.params)))],
            [np.asarray(x) for x in jax.tree_util.tree_leaves(
                jax.device_get(d_state.batch_stats))])
        eng.close()

    # Same envelope rationale as the tests above (both nets at base lr).
    m1, m4 = results[1][0], results[4][0]
    for k in m1:
        np.testing.assert_allclose(m1[k], m4[k], rtol=1e-3, atol=1e-6,
                                   err_msg=k)
    for a, b in zip(results[1][1], results[4][1]):
        np.testing.assert_allclose(a, b, atol=2.5e-4)
    for a, b in zip(results[1][2], results[4][2]):
        np.testing.assert_allclose(a, b, atol=5e-3)


def test_init_distributions():
    """weights_init distributions (lib/utils.py:51-56): conv kernels
    N(0, 0.02), BN scale N(1, 0.02), BN bias 0."""
    import jax.numpy as jnp
    from vfd_gan_tpu.models.mygan import Generator

    x = jnp.zeros((1, 16, 16, 16, 3), jnp.float32)
    variables = Generator(ngf=16).init(jax.random.key(11), x, False)
    params = variables["params"]

    kernels = np.concatenate([
        np.asarray(v).ravel()
        for path, v in jax.tree_util.tree_flatten_with_path(params)[0]
        if "kernel" in str(path[-1])])
    assert abs(kernels.std() - 0.02) < 0.002
    assert abs(kernels.mean()) < 0.002

    scales = np.concatenate([
        np.asarray(v).ravel()
        for path, v in jax.tree_util.tree_flatten_with_path(params)[0]
        if "scale" in str(path[-1])])
    assert abs(scales.mean() - 1.0) < 0.01
    assert abs(scales.std() - 0.02) < 0.005

    biases = [np.asarray(v) for path, v in
              jax.tree_util.tree_flatten_with_path(params)[0]
              if str(path[-1]) == "GetAttrKey(name='bias')"]
    # BN biases exist and are zero
    bn_biases = [np.asarray(v).ravel() for path, v in
                 jax.tree_util.tree_flatten_with_path(params)[0]
                 if "bn" in str(path).lower() and "bias" in str(path[-1])]
    assert bn_biases and all((b == 0).all() for b in bn_biases)
