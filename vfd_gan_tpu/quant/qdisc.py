"""Int8 straight-through conv primitives for IN-TRAINING discriminator
forwards (``--int8_disc``, VERDICT r3 item 9 / ROADMAP "int8 training").

Training-time counterpart of the serving PTQ path (quant/qmygan.py):

* forward: symmetric int8 — activations per-tensor with a DYNAMIC absmax
  scale (no calibration; computed inside the step), weights per-output-
  channel; int32 MXU accumulation (v5e int8 peak is 2x bf16);
* backward: straight-through — the custom_vjp's backward is ``jax.vjp`` of
  the ordinary float lowering (ops/convs) at the UNQUANTISED operands, so
  D's gradients are exactly the float conv's gradients evaluated where the
  forward would have been without quantisation.

Score-safety: in the MyGAN step the generator's update has NO D term (G
trains on weighted BCE alone; the adversarial value is detached telemetry
— models/mygannet.py:279-312, proven by tests/test_flow_scale_invariance
and re-proven for this flag in tests/test_int8_disc.py).  Quantising D's
branch therefore perturbs only D's own trajectory and the loss telemetry,
never G's updates or the scored masks — the same invariance argument as
``flow_scale``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from vfd_gan_tpu.ops.convs import spatial_conv, temporal_conv
from vfd_gan_tpu.quant.qmygan import _per_channel_scale, _quant


def _dyn_scale(x: jnp.ndarray) -> jnp.ndarray:
    """Per-tensor dynamic absmax/127 (f32 scalar)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    return jnp.where(absmax > 0, absmax / 127.0, 1.0)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def qspatial_conv(x, kernel, stride: int, pad: int):
    """Int8 forward / float-STE backward of ``ops.convs.spatial_conv`` with
    symmetric ``pad`` (the discriminator's only spatial-conv shape)."""
    b, t, h, w, c = x.shape
    s_x = _dyn_scale(x)
    s_w = _per_channel_scale(kernel)
    y = lax.conv_general_dilated(
        _quant(x, s_x).reshape(b * t, h, w, c), _quant(kernel, s_w),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_x * s_w)
    return y.reshape(b, t, y.shape[1], y.shape[2], -1).astype(x.dtype)


def _qspatial_fwd(x, kernel, stride, pad):
    return qspatial_conv(x, kernel, stride, pad), (x, kernel)


def _qspatial_bwd(stride, pad, res, g):
    x, kernel = res
    _, vjp = jax.vjp(
        lambda x_, k_: spatial_conv(x_, k_, stride=stride,
                                    padding=[(pad, pad), (pad, pad)]),
        x, kernel)
    return vjp(g.astype(x.dtype))


qspatial_conv.defvjp(_qspatial_fwd, _qspatial_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def qtemporal_conv(x, kernel, pad: int):
    """Int8 forward / float-STE backward of the stride-1
    ``ops.convs.temporal_conv`` (kt shifted int8 channel GEMMs)."""
    kt = kernel.shape[0]
    s_x = _dyn_scale(x)
    s_w = _per_channel_scale(kernel)
    xq = _quant(x, s_x)
    if pad:
        xq = jnp.pad(xq, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    tout = xq.shape[1] - (kt - 1)
    acc = None
    for dt in range(kt):
        term = jnp.einsum("bthwc,cd->bthwd", xq[:, dt:dt + tout],
                          _quant(kernel, s_w)[dt],
                          preferred_element_type=jnp.int32)
        acc = term if acc is None else acc + term
    return (acc.astype(jnp.float32) * (s_x * s_w)).astype(x.dtype)


def _qtemporal_fwd(x, kernel, pad):
    return qtemporal_conv(x, kernel, pad), (x, kernel)


def _qtemporal_bwd(pad, res, g):
    x, kernel = res
    _, vjp = jax.vjp(
        lambda x_, k_: temporal_conv(x_, k_, stride=1, padding=pad),
        x, kernel)
    return vjp(g.astype(x.dtype))


qtemporal_conv.defvjp(_qtemporal_fwd, _qtemporal_bwd)
