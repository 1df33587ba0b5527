"""MyGAN: the proposed forgery-mask GAN (generator + dual discriminator).

Capability rebuild of reference models/mygannet.py:31-213 in channel-last
JAX:

* ``Generator`` — 5-level U-Net over (B, T, H, W, 3) video; every conv is a
  factored (2+1)D GenConvBlock; AvgPool(2) downsamples; trilinear
  align-corners x2 upsamples with skip concats and Dropout(0.25); head
  3x3x3 conv (no bias) + sigmoid -> per-pixel mask video (B, T, H, W, 1).
  (reference: models/mygannet.py:31-101)
* ``SpatialDisc`` — 6 spatial-only (1,3,3) DiscConvBlocks with (1,2,2)
  avg-pool between, global temporal pool, Linear+sigmoid; returns
  (score, features).  (reference: models/mygannet.py:119-162)
* ``TemporalDisc`` — 3 temporal-only (3,1,1) DiscConvBlocks with (2,1,1)
  avg-pool, global spatial pool, Linear+sigmoid; consumes the optical-flow
  video.  (reference: models/mygannet.py:164-196)
* ``DualDisc`` — bundles both; forward(x_rgb, x_flow).
  (reference: models/mygannet.py:200-213)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from vfd_gan_tpu.models.layers import (
    DiscConvBlock,
    GenConvBlock,
    TorchLinear,
)
from vfd_gan_tpu.ops.convs import avg_pool3d, conv3d
from vfd_gan_tpu.ops.resize import upsample2x
from vfd_gan_tpu.utils.init import dcgan_normal_init

Dtype = Any


class Generator(nn.Module):
    """U-Net mask predictor (reference NetG, models/mygannet.py:31-101).

    ``remat=True`` rematerialises each conv block in the backward pass
    (jax.checkpoint), trading ~30% more FLOPs for activation memory — for
    long-clip / large-batch configurations.
    """

    ngf: int = 32
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    remat: bool = False
    # With remat=True: rematerialise only these block names (empty = all).
    # ("dconv1", "uconv1") = the two FULL-RESOLUTION levels whose saved
    # residuals dominate backward HBM reads — the selective
    # bytes-for-flops trade for the bandwidth-bound step (VERDICT r4
    # item 2; measured legs in BENCH_NOTES.md round 5).
    remat_blocks: tuple = ()
    # Reference fixes decoder Dropout at 0.25 (models/mygannet.py:75-99);
    # exposed so deterministic parity tests can zero it.
    drop_rate: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        # static_argnums: (self, x, train) -> `train` must stay a python bool
        remat_cls = nn.remat(GenConvBlock, static_argnums=(2,))

        def blk(f, name):
            use = self.remat and (not self.remat_blocks
                                  or name in self.remat_blocks)
            cls = remat_cls if use else GenConvBlock
            return cls(f, dtype=self.dtype, axis_name=self.axis_name,
                       name=name)
        drop = nn.Dropout(rate=self.drop_rate, deterministic=not train)
        g = self.ngf

        # Encoder: features at full, 1/2, 1/4, 1/8 resolution; bottleneck 1/16.
        d1 = blk(g, "dconv1")(x, train)
        d2 = blk(g * 2, "dconv2")(avg_pool3d(d1, (2, 2, 2)), train)
        d3 = blk(g * 4, "dconv3")(avg_pool3d(d2, (2, 2, 2)), train)
        d4 = blk(g * 8, "dconv4")(avg_pool3d(d3, (2, 2, 2)), train)
        latent = blk(g * 16, "dconv5")(avg_pool3d(d4, (2, 2, 2)), train)

        # Decoder: conv -> dropout -> x2 trilinear upsample -> skip concat.
        y = upsample2x(drop(blk(g * 8, "uconv5")(latent, train)))
        y = jnp.concatenate([y, d4], axis=-1)
        y = upsample2x(drop(blk(g * 8, "uconv4")(y, train)))
        y = jnp.concatenate([y, d3], axis=-1)
        y = upsample2x(drop(blk(g * 4, "uconv3")(y, train)))
        y = jnp.concatenate([y, d2], axis=-1)
        y = upsample2x(drop(blk(g * 2, "uconv2")(y, train)))
        y = jnp.concatenate([y, d1], axis=-1)
        y = blk(g, "uconv1")(y, train)

        head = self.param("head_kernel", dcgan_normal_init(), (3, 3, 3, g, 1))
        y = conv3d(y, head)
        return nn.sigmoid(y.astype(jnp.float32))


class SpatialDisc(nn.Module):
    """Spatial branch (reference SDisc, models/mygannet.py:119-162)."""

    ndf: int = 32
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    quant: bool = False      # int8 forward convs (quant/qdisc.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        blk = lambda f, name: DiscConvBlock(
            f, kernel_size=(1, 3, 3), padding=(0, 1, 1), dtype=self.dtype,
            axis_name=self.axis_name, quant=self.quant, name=name)
        f = self.ndf
        for i, mult in enumerate((1, 2, 4, 8, 16, 32)):
            x = blk(f * mult, f"dconv{i + 1}")(x, train)
            x = avg_pool3d(x, (1, 2, 2))
        features = x                                   # (B, T, s, s, ndf*32)
        x = avg_pool3d(x, (x.shape[1], 1, 1), (1, 1, 1))  # global temporal pool
        x = x.reshape(x.shape[0], -1)
        score = nn.sigmoid(
            TorchLinear(1, dtype=self.dtype, name="linear")(x).astype(jnp.float32))
        return score[:, 0], features


class TemporalDisc(nn.Module):
    """Temporal branch over flow video (reference TDisc,
    models/mygannet.py:164-196)."""

    ndf: int = 32
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        blk = lambda f, name: DiscConvBlock(
            f, kernel_size=(3, 1, 1), padding=(1, 0, 0), dtype=self.dtype,
            axis_name=self.axis_name, quant=self.quant, name=name)
        f = self.ndf
        for i, mult in enumerate((1, 2, 4)):
            x = blk(f * mult, f"dconv{i + 1}")(x, train)
            x = avg_pool3d(x, (2, 1, 1))
        features = x                                    # (B, T/8, H, W, ndf*4)
        x = avg_pool3d(x, (1, x.shape[2], x.shape[3]), (1, 1, 1))  # global spatial
        x = x.reshape(x.shape[0], -1)
        score = nn.sigmoid(
            TorchLinear(1, dtype=self.dtype, name="linear")(x).astype(jnp.float32))
        return score[:, 0], features


class DualDisc(nn.Module):
    """Spatial + temporal discriminator pair (reference NetD,
    models/mygannet.py:200-213).  ``__call__(rgb_video, flow_video)``."""

    ndf: int = 32
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        s_cls, s_feat = SpatialDisc(self.ndf, self.dtype, self.axis_name,
                                    self.quant, name="spatdisc")(x, train)
        t_cls, t_feat = TemporalDisc(self.ndf, self.dtype, self.axis_name,
                                     self.quant, name="tempdisc")(y, train)
        return s_cls, s_feat, t_cls, t_feat
