"""Factored conv/pool primitives vs a torch oracle.

Validates that the TPU-first 2-D lowering of spatial/temporal convs is
numerically identical to the ``nn.Conv3d`` shapes the reference uses
(models/spatiotempconv.py:34-45 etc.).
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from vfd_gan_tpu.ops.convs import (  # noqa: E402
    avg_pool3d,
    conv3d,
    conv3d_transpose,
    max_pool3d,
    r2plus1d_mid_channels,
    spatial_conv,
    temporal_conv,
)

rng = np.random.default_rng(3)
B, T, H, W, CIN, COUT = 2, 4, 8, 8, 3, 5


def _video():
    return rng.normal(size=(B, T, H, W, CIN)).astype(np.float32)


def _torch_conv3d(x_bthwc, w_tkkio, stride=(1, 1, 1), padding=(0, 0, 0)):
    """Oracle: x (B,T,H,W,C) and kernel (kt,kh,kw,Cin,Cout) -> torch conv3d."""
    xt = torch.from_numpy(np.transpose(x_bthwc, (0, 4, 1, 2, 3)))
    wt = torch.from_numpy(np.transpose(w_tkkio, (4, 3, 0, 1, 2)))
    y = F.conv3d(xt, wt, stride=stride, padding=padding)
    return np.transpose(y.numpy(), (0, 2, 3, 4, 1))


def test_spatial_conv_matches_torch():
    x = _video()
    w = rng.normal(size=(3, 3, CIN, COUT)).astype(np.float32) * 0.1
    got = np.asarray(spatial_conv(jnp.asarray(x), jnp.asarray(w), padding=1))
    want = _torch_conv3d(x, w[None], padding=(0, 1, 1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_temporal_conv_matches_torch():
    x = _video()
    w = rng.normal(size=(3, CIN, COUT)).astype(np.float32) * 0.1
    got = np.asarray(temporal_conv(jnp.asarray(x), jnp.asarray(w), padding=1))
    want = _torch_conv3d(x, w[:, None, None], padding=(1, 0, 0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_temporal_conv_xla_emitter_knob_matches(monkeypatch):
    """VFD_TC_XLA=1 (wide-channel A/B knob) routes the stride-1 path
    through the generic conv emitter — same numbers as the GEMM lowering."""
    import os
    x = _video()
    w = rng.normal(size=(3, CIN, COUT)).astype(np.float32) * 0.1
    base = np.asarray(temporal_conv(jnp.asarray(x), jnp.asarray(w),
                                    padding=1))
    monkeypatch.setitem(os.environ, "VFD_TC_XLA", "1")
    alt = np.asarray(temporal_conv(jnp.asarray(x), jnp.asarray(w),
                                   padding=1))
    np.testing.assert_allclose(alt, base, atol=1e-5)


def test_conv3d_matches_torch():
    x = _video()
    w = rng.normal(size=(3, 3, 3, CIN, COUT)).astype(np.float32) * 0.1
    got = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w)))
    want = _torch_conv3d(x, w, padding=(1, 1, 1))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("cout,pad", [(1, 1), (4, 1), (1, 0)])
def test_conv3d_tap_gemm_head_path_matches_torch(cout, pad):
    """Small-Cout convs route through ops/convs._tap_gemm_conv3d on TPU
    backends (the head-conv GEMM path); values must match ``nn.Conv3d``
    exactly.  Tested directly — the dispatch is TPU-only."""
    from vfd_gan_tpu.ops.convs import _tap_gemm_conv3d

    x = _video()
    w = rng.normal(size=(3, 3, 3, CIN, cout)).astype(np.float32) * 0.1
    got = np.asarray(_tap_gemm_conv3d(
        jnp.asarray(x), jnp.asarray(w), [(pad, pad)] * 3))
    want = _torch_conv3d(x, w, padding=(pad, pad, pad))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv3d_tap_gemm_dp_sp_sharded_matches_unsharded():
    """The tap-GEMM head conv under a 2-D (dp, sp) GSPMD mesh: the pad +
    27 shifted-slice adds cross the frame-axis shard boundary, so GSPMD
    must insert halo exchanges.  TPU-only dispatch means the virtual-mesh
    engine tests never reach this path — prove it directly on a fake
    (2, 2) mesh (SURVEY.md §4 distributed-test strategy)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vfd_gan_tpu.ops.convs import _tap_gemm_conv3d

    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")

    x = _video()                                   # (B, T, H, W, C)
    w = rng.normal(size=(3, 3, 3, CIN, 1)).astype(np.float32) * 0.1
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("dp", "sp"))
    sharded = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("dp", "sp")))

    fn = jax.jit(lambda xx: _tap_gemm_conv3d(xx, jnp.asarray(w),
                                             [(1, 1)] * 3))
    np.testing.assert_allclose(np.asarray(fn(sharded)),
                               np.asarray(fn(jnp.asarray(x))), atol=1e-5)


def test_conv3d_tap_gemm_grads_match_torch():
    import jax

    from vfd_gan_tpu.ops.convs import _tap_gemm_conv3d

    x = _video()
    w = rng.normal(size=(3, 3, 3, CIN, 1)).astype(np.float32) * 0.1
    cot = rng.normal(size=(B, T, H, W, 1)).astype(np.float32)

    def loss(xj, wj):
        return jnp.sum(_tap_gemm_conv3d(xj, wj, [(1, 1)] * 3)
                       * jnp.asarray(cot))

    dx, dw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))

    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))).requires_grad_()
    wt = torch.from_numpy(
        np.transpose(w, (4, 3, 0, 1, 2))).requires_grad_()
    y = F.conv3d(xt, wt, padding=1)
    y.backward(torch.from_numpy(np.transpose(cot, (0, 4, 1, 2, 3))))
    np.testing.assert_allclose(
        np.asarray(dx), np.transpose(xt.grad.numpy(), (0, 2, 3, 4, 1)),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dw),
        np.transpose(wt.grad.numpy(), (2, 3, 4, 1, 0)), atol=1e-4)


@pytest.mark.parametrize("cout,pad", [(8, 1), (5, 0)])
def test_conv3d_factored_path_matches_torch(cout, pad):
    """Stride-1 full 3-D convs route through ops/convs._factored_conv3d on
    TPU backends (kt frame-shifted spatial 2-D convs, f32 tap accumulate);
    values must match ``nn.Conv3d``.  Tested directly — dispatch is
    TPU-only."""
    from vfd_gan_tpu.ops.convs import _factored_conv3d

    x = _video()
    w = rng.normal(size=(3, 3, 3, CIN, cout)).astype(np.float32) * 0.1
    got = np.asarray(_factored_conv3d(
        jnp.asarray(x), jnp.asarray(w), [(pad, pad)] * 3))
    want = _torch_conv3d(x, w, padding=(pad, pad, pad))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv3d_factored_grads_match_torch():
    import jax

    from vfd_gan_tpu.ops.convs import _factored_conv3d

    x = _video()
    w = rng.normal(size=(3, 3, 3, CIN, 8)).astype(np.float32) * 0.1
    cot = rng.normal(size=(B, T, H, W, 8)).astype(np.float32)

    def loss(xj, wj):
        return jnp.sum(_factored_conv3d(xj, wj, [(1, 1)] * 3)
                       * jnp.asarray(cot))

    dx, dw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))

    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))).requires_grad_()
    wt = torch.from_numpy(
        np.transpose(w, (4, 3, 0, 1, 2))).requires_grad_()
    y = F.conv3d(xt, wt, padding=1)
    y.backward(torch.from_numpy(np.transpose(cot, (0, 4, 1, 2, 3))))
    np.testing.assert_allclose(
        np.asarray(dx), np.transpose(xt.grad.numpy(), (0, 2, 3, 4, 1)),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dw),
        np.transpose(wt.grad.numpy(), (2, 3, 4, 1, 0)), atol=1e-4)


def test_conv3d_transpose_matches_torch():
    # AnoGAN uses ConvTranspose3d(k=3, stride=2, pad=1, out_pad=1)
    # (anogan.py:51-69)
    x = _video()
    w = rng.normal(size=(3, 3, 3, CIN, COUT)).astype(np.float32) * 0.1
    got = np.asarray(conv3d_transpose(jnp.asarray(x), jnp.asarray(w),
                                      stride=(2, 2, 2)))
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    # torch transpose-conv kernels are (Cin, Cout, kt, kh, kw)
    wt = torch.from_numpy(np.transpose(w, (3, 4, 0, 1, 2)))
    want = F.conv_transpose3d(xt, wt, stride=2, padding=1, output_padding=1)
    want = np.transpose(want.numpy(), (0, 2, 3, 4, 1))
    assert got.shape == want.shape == (B, 2 * T, 2 * H, 2 * W, COUT)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("window", [(2, 2, 2), (1, 2, 2), (2, 1, 1)])
def test_avg_pool3d_matches_torch(window):
    from vfd_gan_tpu.ops.convs import _block_avg_pool

    x = _video()
    got = np.asarray(avg_pool3d(jnp.asarray(x), window))
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    want = np.transpose(F.avg_pool3d(xt, window).numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # the TPU reduce_window path, checked directly (dispatch is TPU-only)
    got_rw = np.asarray(_block_avg_pool(jnp.asarray(x), window))
    np.testing.assert_allclose(got_rw, want, atol=1e-6)


@pytest.mark.parametrize("window", [(1, 2, 2), (2, 2, 2), (2, 1, 1)])
def test_block_avg_pool_grad_matches_torch(window):
    """The reduce_window block pool's hand-written VJP
    (ops/convs._block_avg_pool_bwd) vs torch AvgPool3d autograd.
    Tested directly — avg_pool3d dispatches to it on TPU backends only."""
    import jax

    from vfd_gan_tpu.ops.convs import _block_avg_pool

    x = _video()
    wt, wh, ww = window
    cot = rng.normal(
        size=(B, T // wt, H // wh, W // ww, CIN)).astype(np.float32)

    def loss(xj):
        return jnp.sum(_block_avg_pool(xj, window) * jnp.asarray(cot))

    dx = jax.grad(loss)(jnp.asarray(x))

    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))).requires_grad_()
    y = F.avg_pool3d(xt, window)
    y.backward(torch.from_numpy(np.transpose(cot, (0, 4, 1, 2, 3))))
    np.testing.assert_allclose(
        np.asarray(dx), np.transpose(xt.grad.numpy(), (0, 2, 3, 4, 1)),
        atol=1e-6)


def test_global_avg_pool_with_stride1():
    # SDisc's global temporal pool AvgPool3d((nfr,1,1), stride=1)
    # (mygannet.py:133)
    x = _video()
    got = np.asarray(avg_pool3d(jnp.asarray(x), (T, 1, 1), (1, 1, 1)))
    assert got.shape == (B, 1, H, W, CIN)
    np.testing.assert_allclose(got[:, 0], x.mean(axis=1), atol=1e-6)


def test_max_pool3d_matches_torch():
    # Xception: MaxPool3d((1,3,3), stride (1,2,2), padding (0,1,1))
    # (xception.py:59)
    x = _video()
    got = np.asarray(max_pool3d(jnp.asarray(x), (1, 3, 3), (1, 2, 2), (0, 1, 1)))
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    want = F.max_pool3d(xt, (1, 3, 3), (1, 2, 2), (0, 1, 1)).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 4, 1)), atol=1e-6)


@pytest.mark.parametrize("kt,pad", [(3, 1), (3, 0), (2, 1), (5, 2), (3, 2)])
def test_temporal_conv_custom_vjp_matches_torch_autograd(kt, pad):
    """The hand-written stride-1 backward (ops/convs._tc_s1_bwd) vs torch.

    The custom VJP replaces autodiff's pad-then-add slice gradients with
    transposed shifted GEMMs; both input and kernel grads must match the
    ``nn.Conv3d`` oracle exactly (reference block structure
    models/mygannet.py:13-28).  It is off by default (measured slower on
    the fused step, BENCH_NOTES.md round 3) so the test targets it
    directly.
    """
    import jax

    from vfd_gan_tpu.ops.convs import _temporal_conv_s1

    x = _video()
    w = rng.normal(size=(kt, CIN, COUT)).astype(np.float32) * 0.1
    cot = rng.normal(
        size=(B, T + 2 * pad - kt + 1, H, W, COUT)).astype(np.float32)

    def loss(xj, wj):
        return jnp.sum(_temporal_conv_s1(xj, wj, pad, pad) * jnp.asarray(cot))

    dx, dw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))

    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))).requires_grad_()
    wt = torch.from_numpy(
        np.transpose(w[:, None, None], (4, 3, 0, 1, 2))).requires_grad_()
    y = F.conv3d(xt, wt, padding=(pad, 0, 0))
    y.backward(torch.from_numpy(np.transpose(cot, (0, 4, 1, 2, 3))))

    np.testing.assert_allclose(
        np.asarray(dx), np.transpose(xt.grad.numpy(), (0, 2, 3, 4, 1)),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dw),
        np.transpose(wt.grad.numpy(), (2, 3, 4, 1, 0))[:, 0, 0],
        atol=1e-4)


def test_temporal_conv_oversize_padding_falls_back(monkeypatch):
    """With the custom VJP enabled, pad > kt-1 must fall back to autodiff
    (the transposed-GEMM backward's zero-pad ``kt-1-pad`` would go
    negative) and still produce identical gradients."""
    import jax

    from vfd_gan_tpu.ops import convs

    monkeypatch.setattr(convs, "_TC_CUSTOM_VJP", True)
    x = jnp.asarray(_video())
    w = jnp.asarray(rng.normal(size=(3, CIN, COUT)).astype(np.float32) * 0.1)

    def loss_custom(xj, wj):
        return jnp.sum(temporal_conv(xj, wj, padding=4) ** 2)

    def loss_plain(xj, wj):
        return jnp.sum(convs._tc_s1_impl(xj, wj, 4, 4) ** 2)

    gx1, gw1 = jax.grad(loss_custom, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=1e-5)


def test_r2plus1d_mid_channels_formula():
    # M = floor(t*k*k*Cin*Cout / (k*k*Cin + t*Cout))
    # (models/spatiotempconv.py:44-45)
    assert r2plus1d_mid_channels(3, 3, 3, 3, 32) == (3 * 3 * 3 * 3 * 32) // (3 * 3 * 3 + 3 * 32)
    assert r2plus1d_mid_channels(3, 3, 3, 32, 64) == (3 * 3 * 3 * 32 * 64) // (3 * 3 * 32 + 3 * 64)


def test_tc_family_force_emitter(monkeypatch):
    """The per-family lowering override (round-5 A/B: c2plus1d fastest
    all-emitter): TC_FORCE_EMITTER wins over the width rule, env knobs
    win over it, and engine construction (re)sets it per family."""
    import os

    from vfd_gan_tpu.ops import convs
    monkeypatch.delitem(os.environ, "VFD_TC_XLA", raising=False)
    monkeypatch.setattr(convs, "TC_FORCE_EMITTER", None)
    assert convs._tc_use_emitter(8) is False          # width rule
    monkeypatch.setattr(convs, "TC_FORCE_EMITTER", True)
    assert convs._tc_use_emitter(8) is True           # family override
    monkeypatch.setitem(os.environ, "VFD_TC_XLA", "0")
    assert convs._tc_use_emitter(8) is False          # env audit knob wins
