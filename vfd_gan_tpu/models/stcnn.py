"""(2+1)D residual autoencoder — the "c2plus1d" comparison model.

Capability rebuild of reference models/mystcnn.py:6-88: each block runs a
spatial (1,3,3) conv + BN + ReLU then a temporal (3,1,1) conv + BN + ReLU,
with a 1x1x1-conv residual path; downsample blocks AvgPool(2) both paths,
upsample blocks trilinear-upsample both (residual path also gets
Dropout 0.25); paths are concatenated and fused by a 3x3x3 conv.  The
autoencoder stacks 4 down + 4 up blocks with U-Net skip concats and a
sigmoid mask head.  Also used as the ``--ae`` alternative generator for
MyGAN (models/mygannet.py:224-230).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from vfd_gan_tpu.models.layers import VideoBatchNorm
from vfd_gan_tpu.ops.convs import avg_pool3d, conv3d, spatial_conv, temporal_conv
from vfd_gan_tpu.ops.resize import upsample2x
from vfd_gan_tpu.utils.init import dcgan_normal_init, torch_default_init

Dtype = Any


class C2Plus1dBlock(nn.Module):
    """Residual factored-conv block (reference: models/mystcnn.py:6-49)."""

    features: int
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool, down_samp: bool = False):
        cin = x.shape[-1]
        cout = self.features
        bn = lambda name: VideoBatchNorm(dtype=self.dtype,
                                         axis_name=self.axis_name, name=name)

        residual = x
        sk = self.param("space_kernel", dcgan_normal_init(), (3, 3, cin, cin))
        y = spatial_conv(x, sk, padding=1)
        y = nn.relu(bn("bn1")(y, train))
        tk = self.param("time_kernel", dcgan_normal_init(), (3, cin, cout))
        y = temporal_conv(y, tk, padding=1)
        y = nn.relu(bn("bn2")(y, train))

        # 1x1x1 projection for the residual path (reference `conv`, with bias).
        pk = self.param("proj_kernel", dcgan_normal_init(), (1, 1, 1, cin, cout))
        pb = self.param("proj_bias", torch_default_init(cin), (cout,))

        if down_samp:
            y = avg_pool3d(y, (2, 2, 2))
            residual = conv3d(residual, pk, padding=0) + pb.astype(y.dtype)
            residual = avg_pool3d(residual, (2, 2, 2))
        else:
            y = upsample2x(y)
            residual = nn.Dropout(rate=0.25, deterministic=not train)(residual)
            residual = upsample2x(residual)
            residual = conv3d(residual, pk, padding=0) + pb.astype(y.dtype)

        y = jnp.concatenate([y, residual], axis=-1)
        fk = self.param("fuse_kernel", dcgan_normal_init(),
                        (3, 3, 3, 2 * cout, cout))
        return conv3d(y, fk)


class AutoEncoder(nn.Module):
    """4-down/4-up residual (2+1)D autoencoder with skip concats
    (reference: models/mystcnn.py:52-88)."""

    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        blk = lambda f, name: C2Plus1dBlock(f, dtype=self.dtype,
                                            axis_name=self.axis_name, name=name)
        d1 = blk(64, "down1")(x, train, down_samp=True)
        d2 = blk(128, "down2")(d1, train, down_samp=True)
        d3 = blk(256, "down3")(d2, train, down_samp=True)
        d4 = blk(512, "down4")(d3, train, down_samp=True)

        u1 = blk(256, "up1")(d4, train)
        y = jnp.concatenate([u1, d3], axis=-1)
        u2 = blk(256, "up2")(y, train)
        y = jnp.concatenate([u2, d2], axis=-1)
        u3 = blk(128, "up3")(y, train)
        y = jnp.concatenate([u3, d1], axis=-1)
        u4 = blk(64, "up4")(y, train)

        head = self.param("head_kernel", dcgan_normal_init(), (3, 3, 3, 64, 1))
        return nn.sigmoid(conv3d(u4, head).astype(jnp.float32))
