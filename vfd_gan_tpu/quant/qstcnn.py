"""Int8 PTQ serving forward of the (2+1)D AutoEncoder (c2plus1d / --ae).

Same scheme as quant/qmygan.py, for the second serving family (the
supervised flagship, reference models/mystcnn.py:6-88; also the ``--ae``
generator swap): inference BNs fold into the preceding no-bias convs as a
kernel scale plus an explicit bias, weights are per-output-channel int8,
activations per-site per-tensor int8 with calibrated scales, int32 MXU
accumulation.  The 64->1 head conv stays float.

The mirror follows ``C2Plus1dBlock``/``AutoEncoder.__call__``
(models/stcnn.py:36-95) exactly — residual 1x1x1 projection, pool/upsample
placement, concat order — and its float mode is pinned against
``AutoEncoder.apply`` in tests/test_quant.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from vfd_gan_tpu.ops.convs import avg_pool3d, conv3d
from vfd_gan_tpu.ops.resize import upsample2x
from vfd_gan_tpu.quant.fold import _bn_affine
from vfd_gan_tpu.quant.qmygan import (
    _per_channel_scale,
    _quant,
    _spatial_conv_f32,
    _spatial_conv_i8,
    _temporal_conv_f32,
    _temporal_conv_i8,
    calibrate,
)

_BLOCKS = ["down1", "down2", "down3", "down4", "up1", "up2", "up3", "up4"]
_DOWN = {"down1", "down2", "down3", "down4"}


def fold_autoencoder(variables: dict) -> dict:
    """AutoEncoder variables -> flat per-block conv pack with BN folded.

    Per block: ``space_w/space_b`` (bn1 folded), ``time_w/time_b`` (bn2
    folded), ``proj_w/proj_b`` (reference conv bias, no BN), ``fuse_w``
    (no BN, no bias); plus the root ``head_kernel``.
    """
    params, stats = variables["params"], variables["batch_stats"]
    pack = {"head_kernel": params["head_kernel"]}
    for name in _BLOCKS:
        p, s = params[name], stats[name]
        g1, b1 = _bn_affine(p["bn1"]["BatchNorm_0"], s["bn1"]["BatchNorm_0"])
        g2, b2 = _bn_affine(p["bn2"]["BatchNorm_0"], s["bn2"]["BatchNorm_0"])
        pack[name] = {
            "space_w": p["space_kernel"] * g1, "space_b": b1,
            "time_w": p["time_kernel"] * g2, "time_b": b2,
            "proj_w": p["proj_kernel"], "proj_b": p["proj_bias"],
            "fuse_w": p["fuse_kernel"],
        }
    return pack


def _proj_i8(x, s_x, w_i8, s_w, bias):
    """1x1x1 projection conv as a channel matmul."""
    y = jnp.einsum("bthwc,cd->bthwd", _quant(x, s_x), w_i8[0, 0, 0],
                   preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s_x * s_w) + bias


def _conv3d_i8(x, s_x, w_i8, s_w):
    y = lax.conv_general_dilated(
        _quant(x, s_x), w_i8, window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s_x * s_w)


def _forward(pack: dict, x: jnp.ndarray, *, q: Optional[dict] = None,
             act_scales: Optional[dict] = None):
    """Mirror of AutoEncoder.__call__ (inference).  Float mode returns
    ``(mask, absmax)``; int8 mode returns ``mask``."""
    absmax: dict = {}

    def block(name, y, down):
        p = pack[name]
        residual = y
        if q is None:
            absmax[f"{name}:sp"] = jnp.max(jnp.abs(y))
            y = _spatial_conv_f32(y, p["space_w"], p["space_b"])
        else:
            qb = q[name]
            y = _spatial_conv_i8(y, act_scales[f"{name}:sp"], qb["sp_w"],
                                 qb["sp_s"], p["space_b"])
        y = jax.nn.relu(y)
        if q is None:
            absmax[f"{name}:tp"] = jnp.max(jnp.abs(y))
            y = _temporal_conv_f32(y, p["time_w"], p["time_b"])
        else:
            y = _temporal_conv_i8(y, act_scales[f"{name}:tp"], qb["tp_w"],
                                  qb["tp_s"], p["time_b"])
        y = jax.nn.relu(y)

        if down:
            y = avg_pool3d(y, (2, 2, 2))
        else:
            y = upsample2x(y)
            residual = upsample2x(residual)   # Dropout: inference identity
        if q is None:
            absmax[f"{name}:proj"] = jnp.max(jnp.abs(residual))
            residual = conv3d(residual, p["proj_w"], padding=0) + p["proj_b"]
        else:
            residual = _proj_i8(residual, act_scales[f"{name}:proj"],
                                qb["pj_w"], qb["pj_s"], p["proj_b"])
        if down:
            residual = avg_pool3d(residual, (2, 2, 2))

        y = jnp.concatenate([y, residual], axis=-1)
        if q is None:
            absmax[f"{name}:fuse"] = jnp.max(jnp.abs(y))
            return conv3d(y, p["fuse_w"])
        return _conv3d_i8(y, act_scales[f"{name}:fuse"], qb["fu_w"],
                          qb["fu_s"])

    d1 = block("down1", x, True)
    d2 = block("down2", d1, True)
    d3 = block("down3", d2, True)
    d4 = block("down4", d3, True)

    u1 = block("up1", d4, False)
    u2 = block("up2", jnp.concatenate([u1, d3], axis=-1), False)
    u3 = block("up3", jnp.concatenate([u2, d2], axis=-1), False)
    u4 = block("up4", jnp.concatenate([u3, d1], axis=-1), False)

    out = jax.nn.sigmoid(
        conv3d(u4, pack["head_kernel"]).astype(jnp.float32))
    return out if q is not None else (out, absmax)


def forward_folded(pack: dict, x: jnp.ndarray) -> jnp.ndarray:
    return _forward(pack, x)[0]


def quantize_autoencoder(variables: dict, calib_batches) -> dict:
    """variables -> int8 serving pack for ``autoencoder_forward_int8``.

    Like quantize_generator, the returned ``pack`` is LEAN (biases + head
    kernel only); re-run ``fold_autoencoder`` for audits/export.
    """
    pack = fold_autoencoder(variables)
    act_scales = calibrate(lambda xb: _forward(pack, xb)[1], calib_batches)
    qtree = {}
    lean = {"head_kernel": pack["head_kernel"]}
    for name in _BLOCKS:
        p = pack[name]
        qb = {}
        for tag, key in (("sp", "space_w"), ("tp", "time_w"),
                         ("pj", "proj_w"), ("fu", "fuse_w")):
            s = _per_channel_scale(p[key])
            qb[f"{tag}_w"] = _quant(p[key], s)
            qb[f"{tag}_s"] = s
        qtree[name] = qb
        lean[name] = {"space_b": p["space_b"], "time_b": p["time_b"],
                      "proj_b": p["proj_b"]}
    return {"pack": lean, "q": qtree, "act_scales": act_scales}


def autoencoder_forward_int8(qpack: dict, x: jnp.ndarray) -> jnp.ndarray:
    return _forward(qpack["pack"], x, q=qpack["q"],
                    act_scales=qpack["act_scales"])
