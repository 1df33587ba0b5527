"""AnoGAN: DCGAN-style video GAN baseline.

Capability rebuild of reference models/anogan.py:39-119:

* ``AnoGenerator`` — z in R^100 -> Dense + BN + ReLU -> (T/8, S/8, S/8, 512)
  volume -> three upsampling stages of [Dropout, transpose-conv, conv, BN,
  LeakyReLU] -> sigmoid RGB video.  The reference hardcodes isize=128/nfr=16
  (anogan.py:45,76); we derive the latent volume as (nfr/8, isize/8, isize/8)
  — identical at the defaults — and assert divisibility (fail loudly,
  SURVEY.md §7 "dynamic shapes").
* ``AnoDiscriminator`` — Conv3d stack with AvgPool(2) between stages, then
  Linear + sigmoid; returns (score, flattened features) (anogan.py:81-119).

Quirk preserved: the reference's second activation in D's first stage is
``nn.LeakyReLU(64)`` — a negative_slope of 64, almost surely a typo for a
channel count, but it shapes the trained network, so we reproduce it
(anogan.py:91).

The forgery heat-map |G(z) - real| -> min-max normalise -> grayscale lives
in the engine (vfd_gan_tpu/train/anogan_engine.py), reference
anogan.py:24-37.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from vfd_gan_tpu.models.layers import TorchBatchNorm, TorchLinear, VideoBatchNorm
from vfd_gan_tpu.ops.convs import avg_pool3d, conv3d, conv3d_transpose
from vfd_gan_tpu.utils.init import dcgan_normal_init, torch_default_init

Dtype = Any

Z_DIM = 100


class AnoGenerator(nn.Module):
    """z -> video generator (reference NetG, anogan.py:39-79)."""

    nfr: int = 16
    isize: int = 128
    drop_rate: float = 0.25      # reference anogan.py:50,55,63,68; 0 for tests
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, z, train: bool = False):
        assert self.nfr % 8 == 0 and self.isize % 8 == 0, \
            "AnoGAN needs nfr, isize divisible by 8 (reference hardcodes 16/128)"
        t0, s0 = self.nfr // 8, self.isize // 8
        bn = lambda name: VideoBatchNorm(dtype=self.dtype,
                                         axis_name=self.axis_name, name=name)
        drop = nn.Dropout(rate=self.drop_rate, deterministic=not train)

        # Stage 1: Dense to the seed volume + BN1d + ReLU (anogan.py:43-47).
        x = TorchLinear(512 * t0 * s0 * s0, dtype=self.dtype, name="fc")(z)
        x = TorchBatchNorm(dtype=self.dtype,
                           axis_name=self.axis_name if train else None,
                           name="fc_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        x = x.reshape(z.shape[0], t0, s0, s0, 512)

        def up_stage(x, cout, *, stride, out_pad, name):
            """Dropout -> transpose conv -> 3x3x3 conv -> (BN+LeakyReLU)."""
            cin = x.shape[-1]
            tk = self.param(f"{name}_tkernel",
                            torch_default_init(cout * 27), (3, 3, 3, cin, cout))
            tb = self.param(f"{name}_tbias",
                            torch_default_init(cout * 27), (cout,))
            ck = self.param(f"{name}_ckernel", dcgan_normal_init(),
                            (3, 3, 3, cout, cout))
            cb = self.param(f"{name}_cbias",
                            torch_default_init(cout * 27), (cout,))
            x = drop(x)
            x = conv3d_transpose(x, tk, stride=(stride,) * 3,
                                 output_padding=(out_pad,) * 3)
            x = x + tb.astype(x.dtype)
            x = conv3d(x, ck) + cb.astype(x.dtype)
            return x

        x = up_stage(x, 256, stride=2, out_pad=1, name="up1")
        x = nn.leaky_relu(bn("bn1")(x, train), 0.01)
        x = up_stage(x, 128, stride=2, out_pad=1, name="up2")
        x = nn.leaky_relu(bn("bn2")(x, train), 0.01)
        x = up_stage(x, 64, stride=1, out_pad=0, name="up3")
        x = nn.leaky_relu(bn("bn3")(x, train), 0.01)
        x = up_stage(x, 3, stride=2, out_pad=1, name="up4")
        return nn.sigmoid(x.astype(jnp.float32))


class AnoDiscriminator(nn.Module):
    """Video discriminator (reference NetD, anogan.py:81-119)."""

    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: VideoBatchNorm(dtype=self.dtype,
                                         axis_name=self.axis_name, name=name)

        def c3(x, cout, name):
            cin = x.shape[-1]
            k = self.param(f"{name}_kernel", dcgan_normal_init(),
                           (3, 3, 3, cin, cout))
            b = self.param(f"{name}_bias", torch_default_init(cin * 27), (cout,))
            return conv3d(x, k) + b.astype(x.dtype)

        # Stage 1 (anogan.py:84-93).
        x = nn.leaky_relu(bn("bn1")(c3(x, 32, "conv1"), train), 0.01)
        x = c3(x, 64, "conv2")
        x = c3(x, 64, "conv3")
        # Reference quirk: nn.LeakyReLU(64) — slope 64 (anogan.py:91).
        x = nn.leaky_relu(bn("bn2")(x, train), 64.0)
        x = avg_pool3d(x, (2, 2, 2))
        # Stage 2 (anogan.py:95-105).
        x = c3(x, 128, "conv4")
        x = c3(x, 128, "conv5")
        x = nn.leaky_relu(bn("bn3")(x, train), 0.01)
        x = avg_pool3d(x, (2, 2, 2))
        x = c3(x, 256, "conv6")
        x = nn.leaky_relu(bn("bn4")(x, train), 0.01)
        x = avg_pool3d(x, (2, 2, 2))

        features = x.reshape(x.shape[0], -1)
        score = nn.sigmoid(
            TorchLinear(1, dtype=self.dtype, name="fc")(features)
            .astype(jnp.float32))
        return score[:, 0], features
