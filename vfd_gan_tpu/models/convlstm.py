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

        def cell(carry, xt):
            hprev, cprev = carry
            z = jnp.concatenate([xt, hprev], axis=-1)
            gates = lax.conv_general_dilated(
                z, kernel, (1, 1), [(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if bias is not None:
                gates = gates + bias.astype(gates.dtype)
            i, f, o, g = jnp.split(gates, 4, axis=-1)
            cnext = nn.sigmoid(f) * cprev + nn.sigmoid(i) * jnp.tanh(g)
            hnext = nn.sigmoid(o) * jnp.tanh(cnext)
            return (hnext, cnext), hnext

        h0 = jnp.zeros((b, h, w, self.hidden), self.dtype)
        c0 = jnp.zeros((b, h, w, self.hidden), self.dtype)
        xs = jnp.moveaxis(x.astype(self.dtype), 1, 0)      # (T, B, H, W, C)
        _, hs = lax.scan(cell, (h0, c0), xs)
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
