"""Int8 PTQ serving forward of Xception-3D (third serving family).

Same scheme as quant/qmygan.py — per-output-channel int8 weights,
per-site calibrated activation scales, int32 MXU accumulation — applied to
the largest model in the zoo (trunk up to 2048 channels; reference
models/xception.py:7-174, rebuild models/xception3d.py).

BN placement differs from the other families: inside ``XceptionBlock`` and
after the two head SepaConvs the BN *follows* a ReLU, so it cannot fold
into the preceding conv.  Those BNs stay as their exact inference affine
``y * g + b`` (negligible cost, fused by XLA).  BNs that directly follow a
conv — the two stem convs, every residual ``skip_bn``, and the four decoder
convs — fold into the conv weights as usual (quant/fold._bn_affine).

The mirror ``_forward`` follows ``Xception3D.__call__``
(models/xception3d.py:122-156) exactly — rep/relu ordering, max-pool and
skip placement, decoder upsamples — and its float mode is pinned against
``Xception3D.apply`` in tests/test_quant.py.  The 32->1 head conv and the
sigmoid stay float.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vfd_gan_tpu.ops.convs import max_pool3d, spatial_conv
from vfd_gan_tpu.ops.resize import upsample2x
from vfd_gan_tpu.quant.fold import _bn_affine
from vfd_gan_tpu.quant.qmygan import (
    _per_channel_scale,
    _quant,
    _spatial_conv_i8,
    calibrate,
)

# (name, reps, strides, start_with_relu, has_skip) — grow_first only shapes
# the kernels, which the pack carries.
_BLOCKS = ([("entry1", 2, 2, False, True), ("entry2", 2, 2, False, True),
            ("entry3", 2, 2, False, True)]
           + [(f"middle{i + 1}", 3, 1, True, False) for i in range(8)]
           + [("exit", 2, 1, True, True)])


def _aff(bn_params: dict, bn_stats: dict):
    g, b = _bn_affine(bn_params["BatchNorm_0"], bn_stats["BatchNorm_0"])
    return {"g": g, "b": b}


def fold_xception(variables: dict) -> dict:
    """Xception3D variables -> flat serving pack.

    Folded convs carry ``*_w``/``*_b``; post-ReLU BNs carry affine
    ``{"g", "b"}`` dicts; SepaConv kernels pass through unchanged
    (bias-free in the reference, xception.py:7-21).
    """
    params, stats = variables["params"], variables["batch_stats"]

    def fold(w, bn_name):
        g, b = _bn_affine(params[bn_name]["BatchNorm_0"],
                          stats[bn_name]["BatchNorm_0"])
        return w * g, b

    pack = {"head_kernel": params["head_kernel"],
            "head_bias": params["head_bias"]}
    pack["stem1_w"], pack["stem1_b"] = fold(params["stem1_kernel"],
                                            "stem1_bn")
    pack["stem2_w"], pack["stem2_b"] = fold(params["stem2_kernel"],
                                            "stem2_bn")
    for name, reps, _, _, has_skip in _BLOCKS:
        bp, bs = params[name], stats[name]
        d = {}
        for i in range(1, reps + 1):
            d[f"sepa{i}"] = {"space_w": bp[f"sepa{i}"]["space_kernel"],
                             "point_w": bp[f"sepa{i}"]["point_kernel"]}
            d[f"aff{i}"] = _aff(bp[f"bn{i}"], bs[f"bn{i}"])
        if has_skip:
            g, b = _bn_affine(bp["skip_bn"]["BatchNorm_0"],
                              bs["skip_bn"]["BatchNorm_0"])
            d["skip_w"] = bp["skip_kernel"] * g
            d["skip_b"] = b
        pack[name] = d
    for h in ("head1", "head2"):
        pack[h] = {"space_w": params[h]["space_kernel"],
                   "point_w": params[h]["point_kernel"]}
        pack[f"{h}_aff"] = _aff(params[f"{h}_bn"], stats[f"{h}_bn"])
    for i in range(1, 5):
        # deconv BN lives inside the submodule tree
        g, b = _bn_affine(params[f"deconv{i}"]["bn"]["BatchNorm_0"],
                          stats[f"deconv{i}"]["bn"]["BatchNorm_0"])
        pack[f"deconv{i}_w"] = params[f"deconv{i}"]["kernel"] * g
        pack[f"deconv{i}_b"] = b
    return pack


def _conv_sites(pack: dict) -> dict:
    """Every int8 conv site -> its (folded) float kernel."""
    sites = {"stem1": pack["stem1_w"], "stem2": pack["stem2_w"]}
    for name, reps, _, _, has_skip in _BLOCKS:
        d = pack[name]
        for i in range(1, reps + 1):
            sites[f"{name}:sepa{i}:sp"] = d[f"sepa{i}"]["space_w"]
            sites[f"{name}:sepa{i}:pt"] = d[f"sepa{i}"]["point_w"]
        if has_skip:
            sites[f"{name}:skip"] = d["skip_w"]
    for h in ("head1", "head2"):
        sites[f"{h}:sp"] = pack[h]["space_w"]
        sites[f"{h}:pt"] = pack[h]["point_w"]
    for i in range(1, 5):
        sites[f"deconv{i}"] = pack[f"deconv{i}_w"]
    return sites


def _forward(pack: dict, x: jnp.ndarray, *, q: Optional[dict] = None,
             act_scales: Optional[dict] = None):
    """Mirror of Xception3D.__call__ (inference).  Float mode returns
    ``(mask, absmax)``; int8 mode returns ``mask``."""
    absmax: dict = {}

    def conv(site, y, w, bias=None, *, stride=1, padding=1):
        if q is None:
            absmax[site] = jnp.max(jnp.abs(y))
            y = spatial_conv(y, w, stride=stride, padding=padding)
            return y if bias is None else y + bias
        qw = q[site]
        return _spatial_conv_i8(y, act_scales[site], qw["w"], qw["s"],
                                bias, stride=stride, padding=padding)

    def point(site, y, w):
        if q is None:
            absmax[site] = jnp.max(jnp.abs(y))
            return spatial_conv(y, w, padding=0)
        qw = q[site]
        z = jnp.einsum("bthwc,cd->bthwd", _quant(y, act_scales[site]),
                       qw["w"][0, 0], preferred_element_type=jnp.int32)
        return z.astype(jnp.float32) * (act_scales[site] * qw["s"])

    def sepa(prefix, y, kernels):
        y = jax.nn.relu(conv(f"{prefix}:sp", y,
                             kernels["space_w"] if q is None else None))
        return jax.nn.relu(point(f"{prefix}:pt", y,
                                 kernels["point_w"] if q is None else None))

    y = jax.nn.relu(conv("stem1", x, pack.get("stem1_w"),
                         pack["stem1_b"], stride=2))
    y = jax.nn.relu(conv("stem2", y, pack.get("stem2_w"), pack["stem2_b"]))

    for name, reps, strides, swr, has_skip in _BLOCKS:
        d = pack[name]
        y0 = y
        for i in range(1, reps + 1):
            if i > 1 or swr:
                y = jax.nn.relu(y)
            y = sepa(f"{name}:sepa{i}", y,
                     d.get(f"sepa{i}", {}) if q is None else {})
            aff = d[f"aff{i}"]
            y = y * aff["g"] + aff["b"]
        if strides != 1:
            y = max_pool3d(y, (1, 3, 3), (1, strides, strides), (0, 1, 1))
        if has_skip:
            skip = conv(f"{name}:skip", y0, d.get("skip_w"), d["skip_b"],
                        stride=strides, padding=0)
        else:
            skip = y0
        y = y + skip

    for h in ("head1", "head2"):
        y = sepa(h, y, pack[h] if q is None else {})
        aff = pack[f"{h}_aff"]
        y = jax.nn.relu(y * aff["g"] + aff["b"])

    for i in range(1, 5):
        y = conv(f"deconv{i}", y, pack.get(f"deconv{i}_w"),
                 pack[f"deconv{i}_b"])
        y = jax.nn.leaky_relu(y, negative_slope=0.2)
        y = upsample2x(y, (1, 2, 2))

    y = spatial_conv(y, pack["head_kernel"], padding=1) \
        + pack["head_bias"].astype(y.dtype)
    out = jax.nn.sigmoid(y.astype(jnp.float32))
    return out if q is not None else (out, absmax)


def forward_folded(pack: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Folded float inference forward (mirror sanity surface)."""
    return _forward(pack, x)[0]


def quantize_xception(variables: dict, calib_batches) -> dict:
    """variables -> int8 serving pack for ``xception_forward_int8``.

    Like the other families the pack is LEAN: float conv kernels are
    dropped after quantisation; biases, BN affines and the float head
    survive (re-run ``fold_xception`` for audits/export).
    """
    pack = fold_xception(variables)
    act_scales = calibrate(lambda xb: _forward(pack, xb)[1], calib_batches)
    q = {}
    for site, w in _conv_sites(pack).items():
        s = _per_channel_scale(w)
        q[site] = {"w": _quant(w, s), "s": s}

    lean = {"head_kernel": pack["head_kernel"],
            "head_bias": pack["head_bias"],
            "stem1_b": pack["stem1_b"], "stem2_b": pack["stem2_b"]}
    for name, reps, _, _, has_skip in _BLOCKS:
        d = {f"aff{i}": pack[name][f"aff{i}"] for i in range(1, reps + 1)}
        if has_skip:
            d["skip_b"] = pack[name]["skip_b"]
        lean[name] = d
    for h in ("head1", "head2"):
        lean[f"{h}_aff"] = pack[f"{h}_aff"]
    for i in range(1, 5):
        lean[f"deconv{i}_b"] = pack[f"deconv{i}_b"]
    return {"pack": lean, "q": q, "act_scales": act_scales}


def xception_forward_int8(qpack: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Quantised serving forward: (B, T, H, W, 3) video -> mask video."""
    return _forward(qpack["pack"], x, q=qpack["q"],
                    act_scales=qpack["act_scales"])
