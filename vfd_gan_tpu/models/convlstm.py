"""ConvLSTM mask predictor — temporal recurrence via ``lax.scan``.

Capability rebuild of reference models/convlstm.py:6-218.  The reference
iterates timesteps in a Python double loop (convlstm.py:131-141); here the
recurrence is a single ``lax.scan`` whose body is one fused conv over the
concatenated (input, hidden) planes producing all four gates at once —
traced once, compiled once, sequential only along T as the algorithm demands.

Gate math (convlstm.py:42-58): conv(concat(x, h)) -> split into (i, f, o, g);
c' = sigmoid(f)*c + sigmoid(i)*tanh(g); h' = sigmoid(o)*tanh(c').

``ConvLSTMModel`` stacks three single-layer ConvLSTMs (3->16->12->12) with
BatchNorm between and a 3x3x3 conv + sigmoid head (convlstm.py:173-218).
The reference constructs cells with ``bias=False`` (convlstm.py:183) and
``weights_init`` does not touch Conv2d, so kernels keep torch-default
uniform init.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from vfd_gan_tpu.models.layers import VideoBatchNorm
from vfd_gan_tpu.ops.convs import conv3d
from vfd_gan_tpu.utils.init import dcgan_normal_init, torch_default_init

Dtype = Any


class ConvLSTMLayer(nn.Module):
    """Single ConvLSTM layer over a full clip; returns all hidden states.

    Input ``(B, T, H, W, Cin)`` -> output ``(B, T, H, W, hidden)``.
    """

    hidden: int
    kernel: int = 3
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, cin = x.shape
        k = self.kernel
        fan_in = (cin + self.hidden) * k * k
        kernel = self.param("gate_kernel", torch_default_init(fan_in),
                            (k, k, cin + self.hidden, 4 * self.hidden))
        bias = (self.param("gate_bias", torch_default_init(fan_in),
                           (4 * self.hidden,)) if self.use_bias else None)
        kernel = kernel.astype(self.dtype)
        pad = [(k // 2, k // 2)] * 2

        # conv(concat(x, h), K) == conv(x, Kx) + conv(h, Kh): split the gate
        # kernel along its input-channel axis and hoist the input half OUT of
        # the recurrence as ONE (B*T)-batched conv.  The reference recomputes
        # the full concat conv every timestep inside its Python loop
        # (convlstm.py:42-58,131-141); on TPU that serialises most of the
        # FLOPs behind the scan.  Hoisting makes the input half parallel
        # (large batch, MXU-tileable) and leaves only the genuinely
        # sequential hidden->gates conv in the scan body.  Together with the
        # unrolled scan below this measured 80.5 -> 130.5 clips/s/chip
        # (b4-best -> b8-best, 128x16 bench; the hoist also shrinks scan
        # residuals enough that b8 stops OOMing HBM).  The parameter layout
        # is unchanged (checkpoint/torch-import compatible); the split only
        # reassociates the tap-sum accumulation (PARITY.md).
        kx, kh = kernel[:, :, :cin], kernel[:, :, cin:]
        xg = lax.conv_general_dilated(
            x.astype(self.dtype).reshape(b * t, h, w, cin), kx, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            xg = xg + bias.astype(xg.dtype)
        xgs = jnp.moveaxis(xg.reshape(b, t, h, w, 4 * self.hidden), 1, 0)

        def cell(carry, xg_t):
            hprev, cprev = carry
            gates = xg_t + lax.conv_general_dilated(
                hprev, kh, (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            i, f, o, g = jnp.split(gates, 4, axis=-1)
            cnext = nn.sigmoid(f) * cprev + nn.sigmoid(i) * jnp.tanh(g)
            hnext = nn.sigmoid(o) * jnp.tanh(cnext)
            return (hnext, cnext), hnext

        h0 = jnp.zeros((b, h, w, self.hidden), self.dtype)
        c0 = jnp.zeros((b, h, w, self.hidden), self.dtype)
        # full unroll: T is small and static (<=16 clip windows); per-scan-
        # iteration overhead (output stacking DUS + layout churn around the
        # tiny 12-16ch h-convs) dominated the rolled loop — unrolling was
        # +36% on its own (76.5 -> 104.2 clips/s b4; BENCH_NOTES round 4).
        _, hs = lax.scan(cell, (h0, c0), xgs, unroll=True)
        return jnp.moveaxis(hs, 0, 1)                      # (B, T, H, W, hid)


class ConvLSTMModel(nn.Module):
    """3-layer ConvLSTM stack with inter-layer BN and sigmoid mask head
    (reference: convlstm.py:173-218)."""

    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: VideoBatchNorm(dtype=self.dtype,
                                         axis_name=self.axis_name, name=name)
        for i, hid in enumerate((16, 12, 12)):
            x = ConvLSTMLayer(hid, dtype=self.dtype, name=f"clstm{i + 1}")(x)
            x = bn(f"bn{i + 1}")(x, train)

        head = self.param("head_kernel", dcgan_normal_init(), (3, 3, 3, 12, 1))
        y = conv3d(x, head)
        return nn.sigmoid(y.astype(jnp.float32))
