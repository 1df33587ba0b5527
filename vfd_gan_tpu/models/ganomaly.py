"""GANomaly: encoder-decoder-encoder anomaly detection (per-frame, 2-D).

The reference vendors GANomaly but its copy is dead code with broken imports
(models/ganomaly.py:18-20, trainer branch commented out at trainer.py:25-27);
BASELINE.json still lists "GANomaly enc-dec-enc anomaly scoring" as a target
config, so this is a *native* implementation of the capability
(SURVEY.md C8g): DCGAN pyramid encoder/decoder, generator =
Encoder->Decoder->Encoder, anomaly score = ||z_in - z_out||^2 per sample
(reference pattern models/ganomaly.py:160-175,372), min-max normalised over
the evaluation set (models/ganomaly.py:396).

Frames are processed as 2-D images ``(B, H, W, C)``; a video clip
``(B, T, H, W, C)`` is folded to ``(B*T, H, W, C)`` by the engine.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from vfd_gan_tpu.models.layers import VideoBatchNorm
from vfd_gan_tpu.utils.init import dcgan_normal_init

Dtype = Any


def _conv2d(x, kernel, stride, padding):
    return lax.conv_general_dilated(
        x, kernel, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv2d_transpose(x, kernel, stride, padding):
    k = kernel.shape[0]
    pad = [(k - 1 - padding, k - 1 - padding)] * 2
    flipped = jnp.flip(kernel, axis=(0, 1))
    return lax.conv_general_dilated(
        x, flipped, (1, 1), pad, lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class DcganEncoder(nn.Module):
    """Strided 4x4-conv pyramid: isize -> 4, then optional 4x4 VALID conv to
    a (1,1,nz) latent (reference Encoder, ganomaly.py:24-76)."""

    isize: int
    nz: int
    ndf: int = 64
    n_extra_layers: int = 0
    add_final_conv: bool = True
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.isize % 16 == 0, "isize must be a multiple of 16"
        bn = lambda name: VideoBatchNorm(dtype=self.dtype,
                                         axis_name=self.axis_name, name=name)
        cin = x.shape[-1]

        k = self.param("stem_kernel", dcgan_normal_init(),
                       (4, 4, cin, self.ndf))
        x = nn.leaky_relu(_conv2d(x, k.astype(x.dtype), 2, 1), 0.2)

        feat = self.ndf
        for t in range(self.n_extra_layers):
            ek = self.param(f"extra{t}_kernel", dcgan_normal_init(),
                            (3, 3, feat, feat))
            x = nn.leaky_relu(
                bn(f"extra{t}_bn")(_conv2d(x, ek.astype(x.dtype), 1, 1), train),
                0.2)

        size = self.isize // 2
        i = 0
        while size > 4:
            pk = self.param(f"pyr{i}_kernel", dcgan_normal_init(),
                            (4, 4, feat, feat * 2))
            x = nn.leaky_relu(
                bn(f"pyr{i}_bn")(_conv2d(x, pk.astype(x.dtype), 2, 1), train),
                0.2)
            feat, size, i = feat * 2, size // 2, i + 1

        if self.add_final_conv:
            fk = self.param("final_kernel", dcgan_normal_init(),
                            (4, 4, feat, self.nz))
            x = _conv2d(x, fk.astype(x.dtype), 1, 0)    # (B, 1, 1, nz)
        return x


class DcganDecoder(nn.Module):
    """Transpose-conv pyramid: (1,1,nz) -> isize, tanh output
    (reference Decoder, ganomaly.py:79-131)."""

    isize: int
    nz: int
    nc: int = 3
    ngf: int = 64
    n_extra_layers: int = 0
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, z, train: bool = False):
        assert self.isize % 16 == 0, "isize must be a multiple of 16"
        bn = lambda name: VideoBatchNorm(dtype=self.dtype,
                                         axis_name=self.axis_name, name=name)

        feat, tisize = self.ngf // 2, 4
        while tisize != self.isize:
            feat, tisize = feat * 2, tisize * 2

        k = self.param("stem_kernel", dcgan_normal_init(),
                       (4, 4, self.nz, feat))
        x = nn.relu(bn("stem_bn")(
            _conv2d_transpose(z, k.astype(z.dtype), 1, 0), train))

        size = 4
        i = 0
        while size < self.isize // 2:
            pk = self.param(f"pyr{i}_kernel", dcgan_normal_init(),
                            (4, 4, feat, feat // 2))
            x = nn.relu(bn(f"pyr{i}_bn")(
                _conv2d_transpose(x, pk.astype(x.dtype), 2, 1), train))
            feat, size, i = feat // 2, size * 2, i + 1

        for t in range(self.n_extra_layers):
            ek = self.param(f"extra{t}_kernel", dcgan_normal_init(),
                            (3, 3, feat, feat))
            x = nn.relu(bn(f"extra{t}_bn")(
                _conv2d(x, ek.astype(x.dtype), 1, 1), train))

        fk = self.param("final_kernel", dcgan_normal_init(),
                        (4, 4, feat, self.nc))
        return jnp.tanh(
            _conv2d_transpose(x, fk.astype(x.dtype), 2, 1).astype(jnp.float32))


class GanomalyGenerator(nn.Module):
    """Encoder -> Decoder -> Encoder; returns (fake, z_in, z_out)
    (reference NetG, ganomaly.py:160-186)."""

    isize: int
    nz: int = 100
    nc: int = 3
    ngf: int = 64
    n_extra_layers: int = 0
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name,
                  n_extra_layers=self.n_extra_layers)
        z_in = DcganEncoder(self.isize, self.nz, self.ngf, name="enc1",
                            **kw)(x, train)
        fake = DcganDecoder(self.isize, self.nz, self.nc, self.ngf,
                            name="dec", **kw)(z_in, train)
        z_out = DcganEncoder(self.isize, self.nz, self.ngf, name="enc2",
                             **kw)(fake, train)
        return fake, z_in[:, 0, 0, :], z_out[:, 0, 0, :]


class GanomalyDiscriminator(nn.Module):
    """Encoder trunk -> features; 4x4 conv + sigmoid classifier
    (reference NetD, ganomaly.py:139-158)."""

    isize: int
    nc: int = 3
    ngf: int = 64
    n_extra_layers: int = 0
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = DcganEncoder(self.isize, 1, self.ngf, add_final_conv=False,
                            n_extra_layers=self.n_extra_layers,
                            dtype=self.dtype, axis_name=self.axis_name,
                            name="trunk")(x, train)
        cin = feat.shape[-1]
        ck = self.param("cls_kernel", dcgan_normal_init(), (4, 4, cin, 1))
        score = nn.sigmoid(
            _conv2d(feat, ck.astype(feat.dtype), 1, 0).astype(jnp.float32))
        return score.reshape(-1), feat


def ganomaly_anomaly_score(z_in: jnp.ndarray, z_out: jnp.ndarray) -> jnp.ndarray:
    """Per-sample ||z_in - z_out||^2 mean (reference ganomaly.py:372)."""
    return jnp.mean(jnp.square(z_in - z_out), axis=-1)
