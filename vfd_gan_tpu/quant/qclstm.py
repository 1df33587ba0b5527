"""Int8 PTQ serving forward of the ConvLSTM mask predictor (clstm).

Completes the quantised serving matrix over every ``--model`` family
(reference dispatch lib/train_stcnn.py:52-66): mygan-G (qmygan), the
(2+1)D AutoEncoder (qstcnn), Xception-3D (qxception), and now the
recurrent ConvLSTM (reference models/convlstm.py:6-218).

Scheme: the per-timestep 4-gate conv over ``concat(x, h)`` — where all
the FLOPs are — runs int8: per-output-channel int8 weights, ONE
calibrated per-layer activation scale for the concat plane (its absmax
is tracked across every timestep of the calibration clips, so the
recurrent hidden-state distribution is inside the envelope), int32
accumulation.  The inter-layer BatchNorms cannot fold into the gate
convs (only the x-slice of the concat is normalised, the h-slice is
not), so they stay as explicit f32 affines from the running stats —
elementwise, negligible.  The 12->1 head conv stays float, like every
other family's head.

The float mirror (``convlstm_forward_float``) follows
``ConvLSTMModel.__call__`` exactly (lax.scan cell, gate order i,f,o,g,
models/convlstm.py:56-73) and is pinned against ``model.apply`` in
tests/test_quant.py, so calibration observes the true activations.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from vfd_gan_tpu.ops.convs import conv3d
from vfd_gan_tpu.quant.fold import _bn_affine
from vfd_gan_tpu.quant.qmygan import _per_channel_scale, _quant, calibrate

_LAYERS = (("clstm1", "bn1"), ("clstm2", "bn2"), ("clstm3", "bn3"))


def _gate_conv_f32(z, kernel):
    k = kernel.shape[0]
    return lax.conv_general_dilated(
        z, kernel, (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _gate_conv_i8(z, s_z, w_i8, s_w):
    k = w_i8.shape[0]
    y = lax.conv_general_dilated(
        _quant(z, s_z), w_i8, (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s_z * s_w)


def _layer_scan(x, hid: int, gate):
    """One ConvLSTM layer (models/convlstm.py:56-73); ``gate(z)`` computes
    the 4-gate conv.  Returns all hidden states and the clip-wide absmax
    of the concat plane (the calibration site)."""
    b, t, h, w, _ = x.shape

    def cell(carry, xt):
        hprev, cprev = carry
        z = jnp.concatenate([xt, hprev], axis=-1)
        gates = gate(z)
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        cnext = nn.sigmoid(f) * cprev + nn.sigmoid(i) * jnp.tanh(g)
        hnext = nn.sigmoid(o) * jnp.tanh(cnext)
        return (hnext, cnext), (hnext, jnp.max(jnp.abs(z)))

    h0 = jnp.zeros((b, h, w, hid), jnp.float32)
    c0 = jnp.zeros((b, h, w, hid), jnp.float32)
    _, (hs, zmax) = lax.scan(cell, (h0, c0),
                             jnp.moveaxis(x.astype(jnp.float32), 1, 0))
    return jnp.moveaxis(hs, 0, 1), jnp.max(zmax)


def _forward(params, stats, x, *, q=None, act_scales=None, record=None):
    for idx, (lname, bname) in enumerate(_LAYERS, 1):
        kernel = params[lname]["gate_kernel"]
        hid = kernel.shape[-1] // 4
        if q is None:
            gate = lambda z, k=kernel: _gate_conv_f32(z, k)
        else:
            gate = lambda z, i=idx: _gate_conv_i8(
                z, act_scales[f"l{i}"], q[f"l{i}_w"], q[f"l{i}_s"])
        hs, zmax = _layer_scan(x, hid, gate)
        if record is not None:
            record[f"l{idx}"] = zmax
        g, b = _bn_affine(params[bname]["BatchNorm_0"],
                          stats[bname]["BatchNorm_0"])
        x = hs * g + b
    y = conv3d(x, params["head_kernel"])
    return nn.sigmoid(y.astype(jnp.float32))


def convlstm_forward_float(variables: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Float mirror of ``ConvLSTMModel.apply(..., train=False)``."""
    return _forward(variables["params"], variables["batch_stats"], x)


def quantize_convlstm(variables: dict, calib_batches) -> dict:
    """variables -> int8 serving pack {"params", "stats", "q",
    "act_scales"} for :func:`convlstm_forward_int8`."""
    params, stats = variables["params"], variables["batch_stats"]

    def forward_absmax(xb):
        record: dict = {}
        _forward(params, stats, xb, record=record)
        return record

    act_scales = calibrate(forward_absmax, calib_batches)
    q = {}
    for idx, (lname, _) in enumerate(_LAYERS, 1):
        w = params[lname]["gate_kernel"]
        s_w = _per_channel_scale(w)
        q[f"l{idx}_w"] = _quant(w, s_w)
        q[f"l{idx}_s"] = s_w
    return {"params": params, "stats": stats, "q": q,
            "act_scales": act_scales}


def convlstm_forward_int8(pack: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Quantised serving forward: (B, T, H, W, 3) video -> mask video."""
    return _forward(pack["params"], pack["stats"], x, q=pack["q"],
                    act_scales=pack["act_scales"])
