"""Sequence-parallel (frame-sharded) Generator forward.

Runs the MyGAN U-Net generator with the clip's frame axis sharded over an
``sp`` mesh axis — the long-clip scaling extension (SURVEY.md §5): memory
per chip drops by the shard count while temporal convolutions stay exact
via halo exchange and the decoder's align-corners upsampling uses the
global interpolation grid.

This is an eval-mode functional forward over the *trained parameters* of
:class:`vfd_gan_tpu.models.mygan.Generator` (BatchNorm uses running
statistics; dropout is inactive) — the inference-side path for clips too
long for one chip.  Requires ``nfr >= 16 * sp`` so the bottleneck keeps at
least one frame per shard.

Numerical equality with the unsharded ``Generator.apply`` is tested on the
virtual CPU mesh (tests/test_sp_generator.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vfd_gan_tpu.ops.convs import spatial_conv, temporal_conv, conv3d
from vfd_gan_tpu.parallel.temporal import (
    _upsample2x_t_local,
    halo_exchange,
)


def _bn_eval(x, params, stats, eps=1e-5):
    p = params["BatchNorm_0"]
    s = stats["BatchNorm_0"]
    inv = 1.0 / jnp.sqrt(s["var"] + eps)
    return (x - s["mean"]) * inv * p["scale"] + p["bias"]


def _stconv_local(x, p, stats):
    """STConv forward on a T-sharded block (halo only for the temporal
    conv; the spatial conv and BN/ReLU are frame-local in eval mode)."""
    y = spatial_conv(x, p["spatial_kernel"], padding=1)
    y = y + p["spatial_bias"]
    y = jnp.maximum(_bn_eval(y, p["mid_bn"], stats["mid_bn"]), 0.0)
    y = temporal_conv(halo_exchange(y, 1), p["temporal_kernel"], padding=0)
    return y + p["temporal_bias"]


def _gen_block_local(x, p, stats):
    y = _stconv_local(x, p["stconv"], stats["stconv"])
    y = _bn_eval(y, p["bn"], stats["bn"])
    return jnp.where(y > 0, y, 0.2 * y)          # LeakyReLU(0.2)


def _pool_local(x):
    b, L, h, w, c = x.shape
    return x.reshape(b, L // 2, 2, h // 2, 2, w // 2, 2, c) \
        .mean(axis=(2, 4, 6))


def _upsample_local(x):
    """x2 over (T, H, W): SP-aware over T, local align-corners over H/W."""
    from vfd_gan_tpu.ops.resize import _resize_axis
    y = _upsample2x_t_local(x)
    y = _resize_axis(y, 2, 2 * y.shape[2], True)
    return _resize_axis(y, 3, 2 * y.shape[3], True)


def generator_forward_sp(variables: dict, x: jnp.ndarray,
                         mesh: Mesh) -> jnp.ndarray:
    """Frame-sharded eval forward; ``x`` is a global ``(B, T, H, W, 3)``
    clip with ``T`` divisible by ``16 * sp``."""
    params = variables["params"]
    stats = variables["batch_stats"]
    sp = mesh.shape["sp"]
    assert x.shape[1] % (16 * sp) == 0, (
        f"nfr={x.shape[1]} must be a multiple of 16*sp={16 * sp}")

    def local(xb):
        blk = lambda name, v: _gen_block_local(v, params[name], stats[name])
        d1 = blk("dconv1", xb)
        d2 = blk("dconv2", _pool_local(d1))
        d3 = blk("dconv3", _pool_local(d2))
        d4 = blk("dconv4", _pool_local(d3))
        z = blk("dconv5", _pool_local(d4))

        y = _upsample_local(blk("uconv5", z))
        y = blk("uconv4", jnp.concatenate([y, d4], axis=-1))
        y = _upsample_local(y)
        y = blk("uconv3", jnp.concatenate([y, d3], axis=-1))
        y = _upsample_local(y)
        y = blk("uconv2", jnp.concatenate([y, d2], axis=-1))
        y = _upsample_local(y)
        y = blk("uconv1", jnp.concatenate([y, d1], axis=-1))

        head = params["head_kernel"]
        kt = head.shape[0]
        out = conv3d(halo_exchange(y, kt // 2), head,
                     padding=((0, 0), (1, 1), (1, 1)))
        return 1.0 / (1.0 + jnp.exp(-out.astype(jnp.float32)))

    fn = shard_map(local, mesh=mesh, in_specs=P(None, "sp"),
                   out_specs=P(None, "sp"))
    return fn(x)
