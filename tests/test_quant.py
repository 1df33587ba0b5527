"""BN folding + int8 PTQ of the serving (inference) generator forward."""

import jax
import jax.numpy as jnp
import numpy as np

from vfd_gan_tpu.models.mygan import Generator
from vfd_gan_tpu.quant.fold import fold_generator_bn

rng = np.random.default_rng(3)


def _randomized_generator(ngf=4):
    """Tiny Generator with non-trivial BN affines and running stats."""
    model = Generator(ngf=ngf, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, False)

    def perturb(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if "BatchNorm_0" not in names:
            return leaf
        field = names[-1]
        if field == "var":
            return jnp.asarray(rng.uniform(0.2, 3.0, leaf.shape), jnp.float32)
        return jnp.asarray(rng.normal(0.3, 0.5, leaf.shape), jnp.float32)

    variables = jax.tree_util.tree_map_with_path(perturb, variables)
    return model, variables, x


def test_float_mirror_matches_generator():
    # the calibration/quantisation mirror (quant/qmygan._forward) must
    # track Generator.__call__ exactly, or calibration observes the wrong
    # activations
    from vfd_gan_tpu.quant.qmygan import forward_folded

    model, variables, x = _randomized_generator()
    want = model.apply(fold_generator_bn(variables), x, False)
    got = forward_folded(fold_generator_bn(variables)["params"], x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_int8_forward_tracks_float():
    from vfd_gan_tpu.quant.qmygan import (
        forward_folded,
        generator_forward_int8,
        quantize_generator,
    )

    model, variables, x = _randomized_generator()
    calib = [jnp.asarray(rng.uniform(-1, 1, x.shape), jnp.float32)
             for _ in range(2)] + [x]
    pack = quantize_generator(variables, calib)
    want = np.asarray(forward_folded(
        fold_generator_bn(variables)["params"], x))
    got = np.asarray(generator_forward_int8(pack, x))
    # 8-bit weights + per-tensor activations through 10 conv blocks and a
    # sigmoid: tolerances are coarse but far below any decision threshold
    assert np.max(np.abs(got - want)) < 0.12, np.max(np.abs(got - want))
    assert np.mean(np.abs(got - want)) < 0.02, np.mean(np.abs(got - want))


def test_int8_pack_through_inference_server():
    from types import SimpleNamespace

    from vfd_gan_tpu.cli.serve import InferenceServer, _quantize_int8

    model, variables, x = _randomized_generator()
    args = SimpleNamespace(isize=32, nfr=16, calib_plist="", calib_clips=2)
    pack, apply_fn = _quantize_int8(model, variables, args)
    srv = InferenceServer(model, pack, "g [int8]", isize=32, nfr=16,
                          max_batch=2, max_wait_ms=5.0, apply_fn=apply_fn)
    try:
        clips = np.repeat(np.asarray(x), 2, axis=0)
        pred = srv.predict(clips)
        assert pred.shape == (2, 16, 32, 32, 1)
        want = np.asarray(model.apply(variables, x, False))[0]
        assert np.mean(np.abs(pred[0] - want)) < 0.02
    finally:
        srv.close()


def test_quantize_rejects_non_generator():
    from types import SimpleNamespace

    import flax.linen as nn
    import pytest

    from vfd_gan_tpu.cli.serve import _quantize_int8

    class NotG(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return x

    with pytest.raises(SystemExit):
        _quantize_int8(NotG(), {}, SimpleNamespace(isize=8, nfr=4,
                                                   calib_plist="",
                                                   calib_clips=1))


def test_bn_fold_preserves_inference_forward():
    model, variables, x = _randomized_generator()
    want = model.apply(variables, x, False)
    folded = fold_generator_bn(variables)
    got = model.apply(folded, x, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)
    # the folded BNs are identities: their stats/affines are the fixed
    # identity configuration, not the originals
    bn = folded["params"]["dconv1"]["bn"]["BatchNorm_0"]
    np.testing.assert_array_equal(np.asarray(bn["scale"]), 1.0)
    np.testing.assert_array_equal(np.asarray(bn["bias"]), 0.0)


def _randomized_autoencoder():
    from vfd_gan_tpu.models.stcnn import AutoEncoder

    model = AutoEncoder(dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(1), x, False)

    def perturb(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if "BatchNorm_0" not in names:
            return leaf
        if names[-1] == "var":
            return jnp.asarray(rng.uniform(0.2, 3.0, leaf.shape), jnp.float32)
        return jnp.asarray(rng.normal(0.3, 0.5, leaf.shape), jnp.float32)

    return model, jax.tree_util.tree_map_with_path(perturb, variables), x


def test_ae_float_mirror_matches_autoencoder():
    from vfd_gan_tpu.quant.qstcnn import fold_autoencoder, forward_folded

    model, variables, x = _randomized_autoencoder()
    want = model.apply(variables, x, False)
    got = forward_folded(fold_autoencoder(variables), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_ae_int8_forward_tracks_float():
    from vfd_gan_tpu.quant.qstcnn import (
        autoencoder_forward_int8,
        fold_autoencoder,
        forward_folded,
        quantize_autoencoder,
    )

    model, variables, x = _randomized_autoencoder()
    calib = [jnp.asarray(rng.uniform(-1, 1, x.shape), jnp.float32)] + [x]
    qpack = quantize_autoencoder(variables, calib)
    want = np.asarray(forward_folded(fold_autoencoder(variables), x))
    got = np.asarray(autoencoder_forward_int8(qpack, x))
    assert np.max(np.abs(got - want)) < 0.12, np.max(np.abs(got - want))
    assert np.mean(np.abs(got - want)) < 0.02, np.mean(np.abs(got - want))


def _randomized_xception():
    from vfd_gan_tpu.models.xception3d import Xception3D

    model = Xception3D(dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(2), x, False)

    def perturb(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if "BatchNorm_0" not in names:
            return leaf
        if names[-1] == "var":
            return jnp.asarray(rng.uniform(0.2, 3.0, leaf.shape), jnp.float32)
        return jnp.asarray(rng.normal(0.3, 0.5, leaf.shape), jnp.float32)

    return model, jax.tree_util.tree_map_with_path(perturb, variables), x


def test_xception_float_mirror_matches_model():
    from vfd_gan_tpu.quant.qxception import fold_xception, forward_folded

    model, variables, x = _randomized_xception()
    want = model.apply(variables, x, False)
    got = forward_folded(fold_xception(variables), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_xception_int8_forward_tracks_float():
    from vfd_gan_tpu.quant.qxception import (
        fold_xception,
        forward_folded,
        quantize_xception,
        xception_forward_int8,
    )

    model, variables, x = _randomized_xception()
    calib = [jnp.asarray(rng.uniform(-1, 1, x.shape), jnp.float32)] + [x]
    qpack = quantize_xception(variables, calib)
    want = np.asarray(forward_folded(fold_xception(variables), x))
    got = np.asarray(xception_forward_int8(qpack, x))
    # deeper trunk (28+ quantised convs in sequence) than the other
    # families: slightly coarser max bound, same mean bound
    assert np.max(np.abs(got - want)) < 0.2, np.max(np.abs(got - want))
    assert np.mean(np.abs(got - want)) < 0.02, np.mean(np.abs(got - want))


def _randomized_convlstm():
    from vfd_gan_tpu.models.convlstm import ConvLSTMModel

    model = ConvLSTMModel(dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 6, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(4), x, False)

    def perturb(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if "BatchNorm_0" not in names:
            return leaf
        if names[-1] == "var":
            return jnp.asarray(rng.uniform(0.2, 3.0, leaf.shape), jnp.float32)
        return jnp.asarray(rng.normal(0.3, 0.5, leaf.shape), jnp.float32)

    return model, jax.tree_util.tree_map_with_path(perturb, variables), x


def test_clstm_float_mirror_matches_model():
    from vfd_gan_tpu.quant.qclstm import convlstm_forward_float

    model, variables, x = _randomized_convlstm()
    want = model.apply(variables, x, False)
    got = convlstm_forward_float(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_clstm_int8_forward_tracks_float():
    from vfd_gan_tpu.quant.qclstm import (
        convlstm_forward_float,
        convlstm_forward_int8,
        quantize_convlstm,
    )

    model, variables, x = _randomized_convlstm()
    calib = [jnp.asarray(rng.uniform(-1, 1, x.shape), jnp.float32)] + [x]
    qpack = quantize_convlstm(variables, calib)
    want = np.asarray(convlstm_forward_float(variables, x))
    got = np.asarray(convlstm_forward_int8(qpack, x))
    # the recurrence compounds quantisation noise across T=6 steps, but
    # saturating gates keep it bounded well below any decision threshold
    assert np.max(np.abs(got - want)) < 0.12, np.max(np.abs(got - want))
    assert np.mean(np.abs(got - want)) < 0.02, np.mean(np.abs(got - want))


def test_clstm_int8_through_build_serving():
    from vfd_gan_tpu.quant.qmygan import build_int8_serving

    model, variables, x = _randomized_convlstm()
    pack, apply_fn = build_int8_serving(model, variables, isize=16, nfr=6,
                                        calib_clips=2)
    out = np.asarray(apply_fn(pack, x))
    assert out.shape == (1, 6, 16, 16, 1)
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1
