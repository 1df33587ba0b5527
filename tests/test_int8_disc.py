"""--int8_disc: int8 D-branch forwards are score-invariant and sane.

Same invariance argument as --flow_scale (test_flow_scale_invariance.py):
G's update path contains no D term — the adversarial value is detached
telemetry (models/mygannet.py:279-312) — so quantising D's convs can
change only D's own trajectory and the loss telemetry, never G's
parameters or the scored masks.  Plus unit checks that the STE conv
primitives (quant/qdisc.py) approximate the float convs and back-prop the
float gradients exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vfd_gan_tpu.cli.trainer import build_iterators
from vfd_gan_tpu.config import Config
from vfd_gan_tpu.data.synthetic import make_dataset
from vfd_gan_tpu.ops.convs import spatial_conv, temporal_conv
from vfd_gan_tpu.parallel.mesh import shard_batch
from vfd_gan_tpu.quant.qdisc import qspatial_conv, qtemporal_conv


def test_qspatial_conv_close_and_ste_grads():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 12, 12, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32) * 0.1)

    y_q = qspatial_conv(x, k, 1, 1)
    y_f = spatial_conv(x, k, stride=1, padding=[(1, 1), (1, 1)])
    # int8 forward ~1% relative of the tensor scale
    assert float(jnp.max(jnp.abs(y_q - y_f))) < 0.05 * float(
        jnp.max(jnp.abs(y_f)))

    # STE: gradients are EXACTLY the float conv's gradients
    def loss_q(x, k):
        return jnp.sum(jnp.sin(qspatial_conv(x, k, 1, 1)))

    def loss_f(x, k):
        return jnp.sum(jnp.sin(spatial_conv(x, k, stride=1,
                                            padding=[(1, 1), (1, 1)])))

    gq = jax.grad(loss_q, argnums=(0, 1))(x, k)
    # the cotangent entering the conv differs (cos at quantised vs float
    # output); instead check the STE vjp against a hand-built float vjp at
    # the same cotangent
    g = jnp.ones_like(y_q)
    _, vjp_q = jax.vjp(lambda x_, k_: qspatial_conv(x_, k_, 1, 1), x, k)
    _, vjp_f = jax.vjp(lambda x_, k_: spatial_conv(
        x_, k_, stride=1, padding=[(1, 1), (1, 1)]), x, k)
    for a, b in zip(vjp_q(g), vjp_f(g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all(np.isfinite(np.asarray(t)).all() for t in gq)


def test_qtemporal_conv_close_and_ste_grads():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 8, 8, 12)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 12, 10)).astype(np.float32) * 0.1)

    y_q = qtemporal_conv(x, k, 1)
    y_f = temporal_conv(x, k, stride=1, padding=1)
    assert float(jnp.max(jnp.abs(y_q - y_f))) < 0.05 * float(
        jnp.max(jnp.abs(y_f)))

    g = jnp.ones_like(y_q)
    _, vjp_q = jax.vjp(lambda x_, k_: qtemporal_conv(x_, k_, 1), x, k)
    _, vjp_f = jax.vjp(lambda x_, k_: temporal_conv(x_, k_, stride=1,
                                                    padding=1), x, k)
    for a, b in zip(vjp_q(g), vjp_f(g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_g_update_bit_invariant_to_int8_disc(tmp_path, tmp_path_factory):
    from vfd_gan_tpu.train.gan_engine import MyGanEngine

    root = str(tmp_path_factory.mktemp("i8d_vids"))
    train_list, test_list = make_dataset(root, n_train=1, n_test=1,
                                         frames=48, size=72,
                                         include_originals=False)

    results = {}
    for flag in (False, True):
        cfg = Config(model="mygan", isize=64, nfr=16, batchsize=1, ep=1,
                     freq=10 ** 6, ngf=4, ndf=4, lr=1e-4,
                     int8_disc=flag, result_root=str(tmp_path),
                     tensorboard=False, compute_dtype="float32", seed=7,
                     tr_plist=train_list, ts_plist=test_list).validate()
        eng = MyGanEngine(cfg, *build_iterators(cfg))
        batch = next(iter(eng.train_iter))
        g_state, d_state, metrics, _ = eng._train_step(
            eng.g_state, eng.d_state, shard_batch(eng.mesh, batch),
            jax.random.key(3))
        results[flag] = (
            [np.asarray(x) for x in
             jax.tree_util.tree_leaves(jax.device_get(g_state.params))],
            [np.asarray(x) for x in
             jax.tree_util.tree_leaves(jax.device_get(d_state.params))],
            {k: float(v) for k, v in metrics.items()})
        eng.close()

    # G: bit-identical (its loss/grad graph has no D term)
    for a, b in zip(results[False][0], results[True][0]):
        np.testing.assert_array_equal(a, b)
    # D: still trains (finite, genuinely different trajectory), and its
    # losses stay in the same ballpark as the float branch
    d_diff = max(float(np.max(np.abs(a - b)))
                 for a, b in zip(results[False][1], results[True][1]))
    assert d_diff > 0.0
    for k, v in results[True][2].items():
        assert np.isfinite(v), k
    f, q = results[False][2], results[True][2]
    assert abs(f["d/err_d/train"] - q["d/err_d/train"]) < 0.2, (f, q)
