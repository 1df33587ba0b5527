"""Int8 post-training-quantised serving forward of the MyGAN generator.

The serving model is ``Generator.apply(variables, x, train=False)`` (the
mask predictor behind cli/serve.py and cli/infer.py; reference inference
path models/mygannet.py:369-441 minus its train-mode quirks, PARITY.md).
v5e int8 matmul peak is 2x bf16, and the generator's FLOPs are almost
entirely its factored (2+1)D convs — so those convs run int8 here:

* weights: symmetric per-OUTPUT-channel int8 (absmax / 127) of the
  BN-FOLDED kernels (quant/fold.py) — folding first keeps each output
  channel's dynamic range tight;
* activations: symmetric per-tensor int8 with scales calibrated offline
  (``calibrate`` records per-conv-input absmax over representative
  batches);
* accumulation: int32 on the MXU (``preferred_element_type``), dequantised
  by ``s_x * s_w[out]``, bias added in f32.  Zero padding is exact under
  symmetric quantisation (no zero-point).

Pools, trilinear upsamples, skip concats, the 32->1 head conv and the
sigmoid stay float — they carry negligible FLOPs.

``_forward`` is a pure-function mirror of ``Generator.__call__``
(models/mygan.py:57-87) shared by the float/calibration path and the int8
path, so the mirror cannot drift from what calibration saw; its float mode
is pinned against ``Generator.apply`` bit-for-bit-modulo-f32 in
tests/test_quant.py.
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from vfd_gan_tpu.ops.convs import (
    avg_pool3d,
    conv3d,
    spatial_conv,
    temporal_conv,
)
from vfd_gan_tpu.ops.resize import upsample2x
from vfd_gan_tpu.quant.fold import fold_generator_bn

_BLOCKS = ["dconv1", "dconv2", "dconv3", "dconv4", "dconv5",
           "uconv5", "uconv4", "uconv3", "uconv2", "uconv1"]


def _quant(x: jnp.ndarray, scale) -> jnp.ndarray:
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _per_channel_scale(w: jnp.ndarray) -> jnp.ndarray:
    """absmax/127 over all but the last (output-channel) axis."""
    absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    return jnp.where(absmax > 0, absmax / 127.0, 1.0)


def _spatial_conv_i8(x, s_x, w_i8, s_w, bias=None, *, stride: int = 1,
                     padding: int = 1):
    b, t, h, w, c = x.shape
    y = lax.conv_general_dilated(
        _quant(x, s_x).reshape(b * t, h, w, c), w_i8,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        y = y + bias
    return y.reshape(b, t, y.shape[1], y.shape[2], -1)


def _temporal_conv_i8(x, s_x, w_i8, s_w, bias):
    """Stride-1 (kt,)-tap conv as shifted int8 channel GEMMs (the same
    lowering as ops/convs._tc_s1_impl, int32 accumulation)."""
    kt = w_i8.shape[0]
    pad = kt // 2
    xp = jnp.pad(_quant(x, s_x), ((0, 0), (pad, pad), (0, 0), (0, 0),
                                  (0, 0)))
    tout = x.shape[1]
    acc = None
    for dt in range(kt):
        term = jnp.einsum("bthwc,cd->bthwd", xp[:, dt:dt + tout], w_i8[dt],
                          preferred_element_type=jnp.int32)
        acc = term if acc is None else acc + term
    return acc.astype(jnp.float32) * (s_x * s_w) + bias


def _spatial_conv_f32(x, w, bias):
    """Float mirror path: the model's own lowering (ops/convs.spatial_conv)
    plus the folded bias, so calibration observes exactly what
    Generator.apply computes."""
    return spatial_conv(x, w, padding=[(1, 1), (1, 1)]) + bias


def _temporal_conv_f32(x, w, bias):
    return temporal_conv(x, w, padding=w.shape[0] // 2) + bias


def _forward(params: dict, x: jnp.ndarray, *, q: Optional[dict] = None,
             act_scales: Optional[dict] = None):
    """Shared mirror of Generator.__call__ (inference mode).

    Float mode (``q is None``): BN-folded float convs; returns
    ``(mask, absmax)`` where absmax maps every conv-input site to its
    per-tensor abs-max (the calibration observable).
    Int8 mode: quantised convs with ``act_scales``; returns ``mask``.
    """
    absmax: dict = {}

    def block(name, y):
        p = params[name]["stconv"]
        if q is None:
            absmax[f"{name}:sp"] = jnp.max(jnp.abs(y))
            y = _spatial_conv_f32(y, p["spatial_kernel"], p["spatial_bias"])
        else:
            qb = q[name]
            y = _spatial_conv_i8(y, act_scales[f"{name}:sp"],
                                 qb["sp_w"], qb["sp_s"], p["spatial_bias"])
        y = jax.nn.relu(y)
        if q is None:
            absmax[f"{name}:tp"] = jnp.max(jnp.abs(y))
            y = _temporal_conv_f32(y, p["temporal_kernel"],
                                   p["temporal_bias"])
        else:
            y = _temporal_conv_i8(y, act_scales[f"{name}:tp"],
                                  qb["tp_w"], qb["tp_s"], p["temporal_bias"])
        return jax.nn.leaky_relu(y, 0.2)

    d1 = block("dconv1", x)
    d2 = block("dconv2", avg_pool3d(d1, (2, 2, 2)))
    d3 = block("dconv3", avg_pool3d(d2, (2, 2, 2)))
    d4 = block("dconv4", avg_pool3d(d3, (2, 2, 2)))
    latent = block("dconv5", avg_pool3d(d4, (2, 2, 2)))

    y = upsample2x(block("uconv5", latent))
    y = jnp.concatenate([y, d4], axis=-1)
    y = upsample2x(block("uconv4", y))
    y = jnp.concatenate([y, d3], axis=-1)
    y = upsample2x(block("uconv3", y))
    y = jnp.concatenate([y, d2], axis=-1)
    y = upsample2x(block("uconv2", y))
    y = jnp.concatenate([y, d1], axis=-1)
    y = block("uconv1", y)

    y = conv3d(y, params["head_kernel"])
    out = jax.nn.sigmoid(y.astype(jnp.float32))
    return out if q is not None else (out, absmax)


def forward_folded(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """BN-folded float inference forward (mirror sanity surface)."""
    return _forward(params, x)[0]


def calibrate(forward_absmax, batches) -> dict:
    """Per-site activation scales (absmax/127) over calibration batches.

    ``forward_absmax(batch) -> {site: scalar absmax}`` — shared by every
    quantised family (qstcnn.py uses it too) so the calibration protocol
    cannot drift between them.
    """
    run = jax.jit(forward_absmax)
    agg: dict = {}
    for xb in batches:
        for site, v in run(xb).items():
            agg[site] = max(agg.get(site, 0.0), float(v))
    return {site: (v / 127.0 if v > 0 else 1.0) for site, v in agg.items()}


def quantize_generator(variables: dict, calib_batches) -> dict:
    """variables ({'params','batch_stats'}) -> int8 serving pack.

    Returns ``{"params", "q", "act_scales"}`` consumed by
    ``generator_forward_int8``.  ``params`` is LEAN: only the folded f32
    biases and the (float) head kernel survive — the folded float conv
    kernels would double the serving weight footprint for nothing (re-run
    ``fold_generator_bn`` for audits/export).
    """
    params = fold_generator_bn(variables)["params"]
    act_scales = calibrate(lambda xb: _forward(params, xb)[1], calib_batches)
    qtree, lean = {}, {"head_kernel": params["head_kernel"]}
    for name in _BLOCKS:
        p = params[name]["stconv"]
        sp_s = _per_channel_scale(p["spatial_kernel"])
        tp_s = _per_channel_scale(p["temporal_kernel"])
        qtree[name] = {
            "sp_w": _quant(p["spatial_kernel"], sp_s), "sp_s": sp_s,
            "tp_w": _quant(p["temporal_kernel"], tp_s), "tp_s": tp_s,
        }
        lean[name] = {"stconv": {"spatial_bias": p["spatial_bias"],
                                 "temporal_bias": p["temporal_bias"]}}
    return {"params": lean, "q": qtree, "act_scales": act_scales}


def build_int8_serving(model, variables, *, isize: int, nfr: int,
                       calib_plist: str = "", calib_clips: int = 8):
    """CLI glue: int8-PTQ pack + apply_fn for a MyGAN generator.

    Calibration batches come from ``calib_plist`` (a path-list file of
    videos, one leading clip each, decoded exactly like /predict_video) or
    default to uniform [-1, 1] noise — inputs are [-1, 1]-normalised video
    either way, so noise gives a usable (if loose) per-site range envelope.
    """
    from vfd_gan_tpu.models.convlstm import ConvLSTMModel
    from vfd_gan_tpu.models.mygan import Generator
    from vfd_gan_tpu.models.stcnn import AutoEncoder
    from vfd_gan_tpu.models.xception3d import Xception3D

    if not isinstance(model, (Generator, AutoEncoder, Xception3D,
                              ConvLSTMModel)):
        raise SystemExit(
            "--quant int8 supports mygan-generator, c2plus1d (AutoEncoder), "
            f"xception and clstm checkpoints (got {type(model).__name__})")
    if calib_plist:
        import numpy as np

        from vfd_gan_tpu.data.video_io import read_clip
        with open(calib_plist) as f:
            paths = [ln.strip() for ln in f if ln.strip()]
        batches = [jnp.asarray(
            read_clip(p, 0, nfr, resize_to=(isize, isize)).astype(np.float32)
            / 255.0 * 2.0 - 1.0)[None] for p in paths]
    else:
        keys = jax.random.split(jax.random.key(7), calib_clips)
        batches = [jax.random.uniform(k, (1, nfr, isize, isize, 3),
                                      jnp.float32, -1.0, 1.0) for k in keys]
    if isinstance(model, AutoEncoder):
        from vfd_gan_tpu.quant.qstcnn import (
            autoencoder_forward_int8,
            quantize_autoencoder,
        )
        return (quantize_autoencoder(variables, batches),
                lambda v, x: autoencoder_forward_int8(v, x))
    if isinstance(model, Xception3D):
        from vfd_gan_tpu.quant.qxception import (
            quantize_xception,
            xception_forward_int8,
        )
        return (quantize_xception(variables, batches),
                lambda v, x: xception_forward_int8(v, x))
    if isinstance(model, ConvLSTMModel):
        from vfd_gan_tpu.quant.qclstm import (
            convlstm_forward_int8,
            quantize_convlstm,
        )
        return (quantize_convlstm(variables, batches),
                lambda v, x: convlstm_forward_int8(v, x))
    pack = quantize_generator(variables, batches)
    return pack, lambda v, x: generator_forward_int8(v, x)


def generator_forward_int8(pack: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Quantised serving forward: (B, T, H, W, 3) video -> mask video."""
    return _forward(pack["params"], x, q=pack["q"],
                    act_scales=pack["act_scales"])
