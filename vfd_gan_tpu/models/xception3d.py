"""Xception-3D mask predictor — frame-wise separable convs + decoder.

Capability rebuild of reference models/xception.py:7-174: an Xception trunk
adapted to video by making every kernel spatial-only ``(1,3,3)`` (no temporal
mixing anywhere), followed by a 4-stage upsampling decoder back to full
resolution and a sigmoid mask head.

Structure: stem (2 convs, first with spatial stride 2) -> 3 strided residual
entry blocks (64->128->256->728) -> 8 identity middle blocks at 728 ->
exit block (728->1024, grow-last) -> SepaConv 1536/2048 -> 4 DeConv
upsample stages (1,2,2) -> 1-channel head.

Note: the reference's "SepaConv" is *not* depthwise-separable — it is a full
(1,3,3) conv followed by a full pointwise conv, each followed by ReLU
(xception.py:7-21); we reproduce that faithfully.

The module is written setup-style and split into ``front`` / ``middles`` /
``back`` methods (``__call__`` chains them, bit-identical to the original
fused form): the 8 identity middle blocks share one signature, which is
exactly the chain the GPipe pipeline primitive (parallel/pipeline.py)
stage-shards over a ``pp`` mesh axis.  Parameter names and init values are
unchanged (flax derives init RNGs from parameter *paths*, not creation
order), so checkpoints and the ``.pth`` converters are unaffected.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from vfd_gan_tpu.models.layers import VideoBatchNorm
from vfd_gan_tpu.ops.convs import max_pool3d, spatial_conv
from vfd_gan_tpu.ops.resize import upsample2x
from vfd_gan_tpu.utils.init import dcgan_normal_init, torch_default_init

Dtype = Any

N_MIDDLE_BLOCKS = 8  # identity 728-channel blocks (reference xception.py:107-115)


class SepaConv(nn.Module):
    """(1,3,3) conv -> ReLU -> 1x1x1 pointwise conv -> ReLU
    (reference: xception.py:7-21; both convs bias-free)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k1 = self.param("space_kernel", dcgan_normal_init(), (3, 3, cin, cin))
        x = nn.relu(spatial_conv(x, k1, padding=1))
        k2 = self.param("point_kernel", dcgan_normal_init(),
                        (1, 1, cin, self.features))
        return nn.relu(spatial_conv(x, k2, padding=0))


class XceptionBlock(nn.Module):
    """Residual block of `reps` SepaConvs with optional spatial-stride skip
    (reference: xception.py:23-72)."""

    features: int
    reps: int
    strides: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        cin = x.shape[-1]
        bn = lambda name: VideoBatchNorm(dtype=self.dtype,
                                         axis_name=self.axis_name, name=name)
        y = x
        widths = []
        if self.grow_first:
            widths.append(self.features)
            widths += [self.features] * (self.reps - 1)
        else:
            widths += [cin] * (self.reps - 1)
            widths.append(self.features)

        for i, w in enumerate(widths):
            if i > 0 or self.start_with_relu:
                y = nn.relu(y)
            y = SepaConv(w, dtype=self.dtype, name=f"sepa{i + 1}")(y)
            y = bn(f"bn{i + 1}")(y, train)

        if self.strides != 1:
            y = max_pool3d(y, (1, 3, 3), (1, self.strides, self.strides),
                           (0, 1, 1))

        if self.features != cin or self.strides != 1:
            sk = self.param("skip_kernel", dcgan_normal_init(),
                            (1, 1, cin, self.features))
            skip = spatial_conv(x, sk, stride=self.strides, padding=0)
            skip = bn("skip_bn")(skip, train)
        else:
            skip = x
        return y + skip


class DeConvBlock(nn.Module):
    """Decoder stage: (1,3,3) conv -> BN -> LeakyReLU(0.2) -> Dropout(0.25)
    -> (1,2,2) trilinear upsample (reference: xception.py:74-89)."""

    features: int
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        cin = x.shape[-1]
        k = self.param("kernel", dcgan_normal_init(), (3, 3, cin, self.features))
        y = spatial_conv(x, k, padding=1)
        y = VideoBatchNorm(dtype=self.dtype, axis_name=self.axis_name,
                           name="bn")(y, train)
        y = nn.leaky_relu(y, negative_slope=0.2)
        y = nn.Dropout(rate=0.25, deterministic=not train)(y)
        return upsample2x(y, (1, 2, 2))


class Xception3D(nn.Module):
    """Full Xception trunk + upsampling decoder (reference: xception.py:92-174).

    ``width_mult`` scales every channel width (1.0 = exact reference widths;
    narrow settings exist for fast pipeline-parallel tests/dry runs — the
    728-channel trunk is otherwise too heavy for the 1-core CPU harness).
    """

    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    in_channels: int = 3
    width_mult: float = 1.0
    # --moe_experts extension (no reference equivalent): > 0 inserts a
    # residual token-MoE block (models/moe_block.py) after the middle
    # chain; ``mesh`` enables expert-parallel dispatch over its ep axis.
    moe_experts: int = 0
    moe_capacity: float = 2.0
    mesh: Any = None

    def _w(self, c: int) -> int:
        return max(1, round(c * self.width_mult))

    def setup(self):
        w = self._w
        self.stem1_kernel = self.param(
            "stem1_kernel", dcgan_normal_init(), (3, 3, self.in_channels, w(32)))
        self.stem1_bn = VideoBatchNorm(dtype=self.dtype,
                                       axis_name=self.axis_name)
        self.stem2_kernel = self.param(
            "stem2_kernel", dcgan_normal_init(), (3, 3, w(32), w(64)))
        self.stem2_bn = VideoBatchNorm(dtype=self.dtype,
                                       axis_name=self.axis_name)

        blk = lambda f, reps, s, swr, gf, axis: XceptionBlock(
            f, reps, s, swr, gf, dtype=self.dtype, axis_name=axis)
        self.entry1 = blk(w(128), 2, 2, False, True, self.axis_name)
        self.entry2 = blk(w(256), 2, 2, False, True, self.axis_name)
        self.entry3 = blk(w(728), 2, 2, False, True, self.axis_name)
        for i in range(N_MIDDLE_BLOCKS):
            setattr(self, f"middle{i + 1}",
                    blk(w(728), 3, 1, True, True, self.axis_name))
        self.exit = blk(w(1024), 2, 1, True, False, self.axis_name)

        if self.moe_experts:
            from vfd_gan_tpu.models.moe_block import MoEMlp
            self.moe = MoEMlp(self.moe_experts,
                              capacity_factor=self.moe_capacity,
                              dtype=self.dtype, mesh=self.mesh)

        self.head1 = SepaConv(w(1536), dtype=self.dtype)
        self.head1_bn = VideoBatchNorm(dtype=self.dtype,
                                       axis_name=self.axis_name)
        self.head2 = SepaConv(w(2048), dtype=self.dtype)
        self.head2_bn = VideoBatchNorm(dtype=self.dtype,
                                       axis_name=self.axis_name)

        for i, f in enumerate((w(1024), w(256), w(128), w(32))):
            setattr(self, f"deconv{i + 1}",
                    DeConvBlock(f, dtype=self.dtype, axis_name=self.axis_name))

        self.head_kernel = self.param(
            "head_kernel", dcgan_normal_init(), (3, 3, w(32), 1))
        self.head_bias = self.param(
            "head_bias", torch_default_init(w(32) * 9), (1,))

    def front(self, x, train: bool = False):
        """Stem + entry blocks: input video -> 728-channel trunk features."""
        x = nn.relu(self.stem1_bn(
            spatial_conv(x, self.stem1_kernel, stride=2, padding=1), train))
        x = nn.relu(self.stem2_bn(
            spatial_conv(x, self.stem2_kernel, padding=1), train))
        x = self.entry1(x, train)
        x = self.entry2(x, train)
        return self.entry3(x, train)

    def middles(self, x, train: bool = False):
        """The 8 signature-preserving middle blocks (the GPipe stage chain),
        plus the opt-in residual token-MoE tail (``--moe_experts``)."""
        for i in range(N_MIDDLE_BLOCKS):
            x = getattr(self, f"middle{i + 1}")(x, train)
        if self.moe_experts:
            x = self.moe(x, train)
        return x

    def back(self, x, train: bool = False):
        """Exit block + SepaConv heads + decoder + sigmoid mask head."""
        x = self.exit(x, train)
        x = nn.relu(self.head1_bn(self.head1(x), train))
        x = nn.relu(self.head2_bn(self.head2(x), train))
        for i in range(4):
            x = getattr(self, f"deconv{i + 1}")(x, train)
        y = spatial_conv(x, self.head_kernel, padding=1) \
            + self.head_bias.astype(x.dtype)
        return nn.sigmoid(y.astype(jnp.float32))

    def __call__(self, x, train: bool = False):
        return self.back(self.middles(self.front(x, train), train), train)
