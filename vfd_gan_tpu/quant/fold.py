"""Fold inference-mode BatchNorm into the MyGAN generator's conv weights.

Every ``GenConvBlock`` is ``spatial_conv(+bias) -> BN -> relu ->
temporal_conv(+bias) -> BN -> leaky_relu`` (models/layers.py; reference
block models/mygannet.py:13-28).  In inference mode each BN is the affine
``y = (x - mu) * g + beta`` with ``g = scale * rsqrt(var + eps)`` — which
composes exactly into the preceding conv:

    W' = W * g[out]          b' = (b - mu) * g + beta

The fold returns a variables tree for the SAME ``Generator`` module: conv
kernels/biases carry the BN affine, and every folded BN's parameters are
set to the identity configuration (scale 1, bias 0, mean 0, var 1 - eps, so
``rsqrt(var + eps) == 1`` exactly).  ``Generator.apply(folded, x,
train=False)`` therefore reproduces the un-folded inference forward to f32
rounding — pinned by tests/test_quant.py.

Only valid for inference: a train-mode forward would recompute batch
statistics of the now-rescaled activations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-5   # TorchBatchNorm.epsilon (models/layers.py)


def _bn_affine(bn_params: dict, bn_stats: dict):
    g = bn_params["scale"] * jax.lax.rsqrt(bn_stats["var"] + _EPS)
    return g, bn_params["bias"] - bn_stats["mean"] * g


def _identity_bn(like_params: dict):
    feat = like_params["scale"].shape
    return ({"scale": jnp.ones(feat, jnp.float32),
             "bias": jnp.zeros(feat, jnp.float32)},
            {"mean": jnp.zeros(feat, jnp.float32),
             "var": jnp.full(feat, 1.0 - _EPS, jnp.float32)})


def _fold_block(params: dict, stats: dict) -> tuple[dict, dict]:
    """One GenConvBlock: fold mid_bn into the spatial conv and the block
    bn into the temporal conv."""
    st_p = dict(params["stconv"])
    g, b = _bn_affine(st_p["mid_bn"]["BatchNorm_0"],
                      stats["stconv"]["mid_bn"]["BatchNorm_0"])
    st_p["spatial_kernel"] = st_p["spatial_kernel"] * g
    st_p["spatial_bias"] = st_p["spatial_bias"] * g + b
    id_p, id_s = _identity_bn(st_p["mid_bn"]["BatchNorm_0"])

    g2, b2 = _bn_affine(params["bn"]["BatchNorm_0"],
                        stats["bn"]["BatchNorm_0"])
    st_p["temporal_kernel"] = st_p["temporal_kernel"] * g2
    st_p["temporal_bias"] = st_p["temporal_bias"] * g2 + b2
    id_p2, id_s2 = _identity_bn(params["bn"]["BatchNorm_0"])

    st_p["mid_bn"] = {"BatchNorm_0": id_p}
    return ({"stconv": st_p, "bn": {"BatchNorm_0": id_p2}},
            {"stconv": {"mid_bn": {"BatchNorm_0": id_s}},
             "bn": {"BatchNorm_0": id_s2}})


def fold_generator_bn(variables: dict) -> dict:
    """BN-fold a ``Generator`` variables tree ({'params', 'batch_stats'})."""
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    for name in list(params):
        if name == "head_kernel":
            continue
        params[name], stats[name] = _fold_block(params[name], stats[name])
    return {"params": params, "batch_stats": stats}
