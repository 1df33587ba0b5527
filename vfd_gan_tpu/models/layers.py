"""Shared flax building blocks (channel-last video, factored convs).

Capability equivalents of the reference primitives:
* ``STConv``       <- models/spatiotempconv.py:7-65 (R(2+1)D factored conv)
* ``GenConvBlock`` <- models/mygannet.py:13-28 (NetgConv: STConv+BN+LeakyReLU 0.2)
* ``DiscConvBlock``<- models/mygannet.py:104-116 (NetdConv: default LeakyReLU 0.01)
* ``VideoBatchNorm`` wraps flax BatchNorm with torch momentum/eps semantics
  and optional cross-replica axis sync (SURVEY.md §2.3 BN note).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfd_gan_tpu.ops.convs import (
    r2plus1d_mid_channels,
    spatial_conv,
    temporal_conv,
)
from vfd_gan_tpu.utils.init import (
    bn_scale_init,
    dcgan_normal_init,
    torch_default_init,
)

Dtype = Any


def _BN_ONEPASS() -> bool:
    """Read at trace time so tests/benches can toggle per-jit."""
    return os.environ.get("VFD_BN_ONEPASS", "0") == "1"


def _BN_NORM_LOWP() -> bool:
    """VFD_BN_NORM_LOWP=1: normalise in the model dtype instead of f32
    (statistics stay f32).  Perf A/B knob for bf16 models — the f32
    normalise makes autodiff thread full-resolution f32 cotangents through
    every BN (the profile's convert_reduce/f32-activation band); bf16
    normalise keeps the backward chain in bf16.  No effect on f32 models
    (parity/equivalence tests are f32 and unchanged)."""
    return os.environ.get("VFD_BN_NORM_LOWP", "0") == "1"


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch running-stat semantics.

    flax's ``nn.BatchNorm`` folds the *biased* batch variance into the
    running average; torch BatchNorm3d folds the *unbiased* one
    (Bessel-corrected by N/(N-1)) while still normalising with the biased
    variance.  The gap is ~1/N relative — systematic, and visible in the
    golden train-step parity tests — so this module reimplements the stat
    update torch-style.  Variable names/shapes match flax ``nn.BatchNorm``
    (params ``scale``/``bias``, batch_stats ``mean``/``var``) so checkpoint
    trees and the ``.pth`` converters are unchanged.
    """

    momentum: float = 0.1                 # torch convention (new-stat share)
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        feat = x.shape[-1]
        scale = self.param("scale", bn_scale_init(), (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (feat,),
                                jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (feat,),
                               jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif _BN_ONEPASS():
            # VFD_BN_ONEPASS=1 (measured experiment, BENCH_NOTES.md):
            # shifted one-pass statistics.  A cheap pilot reduce over the
            # first batch element gives a per-channel shift c ~ mean, then
            # ONE fused pass over x computes E[x-c] and E[(x-c)^2]
            # (XLA fuses same-operand reductions into one read), halving
            # the big stat-pass HBM traffic vs the two-pass form below.
            # Unlike the raw E[x^2]-E[x]^2 (catastrophic on near-constant
            # channels), the subtraction sq - mean_d^2 only cancels by
            # (mean-c)^2/var ~ O(1): c is within one between-clip std of
            # the batch mean, so at most ~1 of f32's digits is lost.
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            c = jax.lax.stop_gradient(jnp.mean(xf[:1], axes))
            if self.axis_name is not None:
                # the shift must be identical on every replica for the
                # var identity to hold across the pmean
                c = jax.lax.pmean(c, self.axis_name)
            d = xf - c
            mean_d = jnp.mean(d, axes)
            sq = jnp.mean(jnp.square(d), axes)
            n = jnp.float32(x.size // feat)
            if self.axis_name is not None:
                mean_d = jax.lax.pmean(mean_d, self.axis_name)
                sq = jax.lax.pmean(sq, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            mean = c + mean_d
            var = jnp.maximum(sq - jnp.square(mean_d), 0.0)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            n = jnp.float32(x.size // feat)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            # Two-pass variance E[(x-mu)^2], NOT E[x^2]-E[x]^2: the one-pass
            # form catastrophically cancels on near-constant channels (true
            # var ~1e-6 under mean^2 ~0.3 loses ~7 of f32's digits — mask
            # videos at init are exactly this), which made dp1 vs dp4
            # reduction order visibly change deep activations.  torch's own
            # variance is the stable form, so this is also the parity choice.
            var = jnp.mean(jnp.square(xf - mean), axes)
            if self.axis_name is not None:
                var = jax.lax.pmean(var, self.axis_name)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        if _BN_NORM_LOWP() and self.dtype != jnp.float32:
            d = self.dtype
            y = (x.astype(d) - mean.astype(d)) * jax.lax.rsqrt(
                var + self.epsilon).astype(d)
            return y * scale.astype(d) + bias.astype(d)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class VideoBatchNorm(nn.Module):
    """BatchNorm over (B, T, H, W) per channel.

    torch BatchNorm3d semantics: momentum 0.1, eps 1e-5, unbiased running
    variance, running stats updated in train mode.  ``axis_name`` enables
    cross-replica statistics under shard_map (an upgrade over DataParallel's
    per-replica stats; flagged in parity docs).
    """

    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        return TorchBatchNorm(
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            name="BatchNorm_0",
        )(x, use_running_average=not train)


class STConv(nn.Module):
    """Factored (2+1)D convolution: spatial (1,kh,kw) conv -> BN -> ReLU ->
    temporal (kt,1,1) conv, intermediate width from the R(2+1)D formula.

    Acts as a drop-in 3-D conv like the reference's SpatioTemporalConv
    (models/spatiotempconv.py:22-65).
    """

    features: int
    kernel_size: Sequence[int] = (3, 3, 3)   # (kt, kh, kw)
    stride: Sequence[int] = (1, 1, 1)
    padding: Sequence[int] = (0, 0, 0)
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    # int8 forward + float-STE backward (quant/qdisc.py) — used by the
    # discriminator under --int8_disc; requires symmetric spatial padding
    # and stride-1 temporal conv (the only shapes the D family has).
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        kt, kh, kw = self.kernel_size
        st, sh, sw = self.stride
        pt, ph, pw = self.padding
        cin = x.shape[-1]
        mid = r2plus1d_mid_channels(kt, kh, kw, cin, self.features)

        sk = self.param("spatial_kernel", dcgan_normal_init(),
                        (kh, kw, cin, mid))
        assert sh == sw, "anisotropic spatial stride unused by the reference"
        if self.quant and ph == pw:
            from vfd_gan_tpu.quant.qdisc import qspatial_conv
            y = qspatial_conv(x, sk.astype(self.dtype), sh, ph)
        else:
            y = spatial_conv(x, sk, stride=sh, padding=[(ph, ph), (pw, pw)])
        if self.use_bias:
            sb = self.param("spatial_bias", torch_default_init(cin * kh * kw),
                            (mid,))
            y = y + sb.astype(y.dtype)

        y = VideoBatchNorm(dtype=self.dtype, axis_name=self.axis_name,
                           name="mid_bn")(y, train)
        y = nn.relu(y)

        tk = self.param("temporal_kernel", dcgan_normal_init(),
                        (kt, mid, self.features))
        if self.quant and st == 1:
            from vfd_gan_tpu.quant.qdisc import qtemporal_conv
            y = qtemporal_conv(y, tk.astype(self.dtype), pt)
        else:
            y = temporal_conv(y, tk, stride=st, padding=pt)
        if self.use_bias:
            tb = self.param("temporal_bias", torch_default_init(mid * kt),
                            (self.features,))
            y = y + tb.astype(y.dtype)
        return y


class GenConvBlock(nn.Module):
    """STConv -> BN -> LeakyReLU(0.2): the generator's conv block
    (models/mygannet.py:13-28, kernel k with SAME padding k//2)."""

    features: int
    kernel: int = 3
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        k = self.kernel
        p = k // 2
        y = STConv(self.features, (k, k, k), padding=(p, p, p),
                   dtype=self.dtype, axis_name=self.axis_name,
                   name="stconv")(x, train)
        y = VideoBatchNorm(dtype=self.dtype, axis_name=self.axis_name,
                           name="bn")(y, train)
        return nn.leaky_relu(y, negative_slope=0.2)


class DiscConvBlock(nn.Module):
    """STConv -> BN -> LeakyReLU(default 0.01): the discriminator's conv
    block (models/mygannet.py:104-116 — note the default slope, not 0.2)."""

    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    padding: Sequence[int] = (1, 1, 1)
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        y = STConv(self.features, self.kernel_size, padding=self.padding,
                   dtype=self.dtype, axis_name=self.axis_name,
                   quant=self.quant, name="stconv")(x, train)
        y = VideoBatchNorm(dtype=self.dtype, axis_name=self.axis_name,
                           name="bn")(y, train)
        return nn.leaky_relu(y, negative_slope=0.01)


class TorchLinear(nn.Module):
    """Dense layer with PyTorch-default init (weights_init skips Linear)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=torch_default_init(fan_in),
            bias_init=torch_default_init(fan_in),
        )(x)
