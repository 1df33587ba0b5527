"""Sequence (frame-axis) parallelism with halo exchange — optional extension.

The reference has no sequence-length scaling: clips are fixed at
``--nfr 16`` and memory grows linearly with nfr through the U-Net
activations (SURVEY.md §5 "long-context").  This module implements the
natural TPU extension documented there: shard the frame axis across a mesh
axis and exchange (kt-1)/2 boundary frames between neighbouring shards via
``lax.ppermute`` so temporal convolutions stay exact.

Used by long-clip configurations (nfr >> 16) where a single chip can't hold
the activations; data parallelism remains the default mapping for the
reference workload.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from vfd_gan_tpu.ops.convs import temporal_conv


def make_sp_mesh(sp: int, devices=None) -> Mesh:
    """1-D mesh over the sequence-parallel axis ``"sp"``."""
    import numpy as np
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices[:sp]), axis_names=("sp",))


def halo_exchange(block: jnp.ndarray, halo: int, axis_name: str = "sp"):
    """Append ``halo`` frames from each neighbour to a local (B, T_loc, ...)
    block: left halo from the previous shard, right halo from the next.
    Edge shards receive zero frames (zero padding, matching the unsharded
    conv's zero-padded boundary)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    # send my last `halo` frames rightward; my first `halo` frames leftward
    right_perm = [(i, (i + 1) % n) for i in range(n)]
    left_perm = [(i, (i - 1) % n) for i in range(n)]
    from_left = lax.ppermute(block[:, -halo:], axis_name, right_perm)
    from_right = lax.ppermute(block[:, :halo], axis_name, left_perm)

    zeros = jnp.zeros_like(from_left)
    from_left = jnp.where(idx == 0, zeros, from_left)
    from_right = jnp.where(idx == n - 1, zeros, from_right)
    return jnp.concatenate([from_left, block, from_right], axis=1)


def _upsample2x_t_local(block: jnp.ndarray, axis_name: str = "sp"):
    """Local part of align-corners x2 temporal upsampling of a T-sharded
    clip: exchange one halo frame per side, then interpolate at the global
    align_corners grid ``src = i * (T-1) / (2T-1)``.

    The source index band needed by shard k's output block is
    [k*L - 1, (k+1)*L], exactly the local block plus one halo frame each
    way; edge shards never index into their (zeroed) outer halos because
    the clamped global indices stay inside their own frames.
    """
    n = lax.axis_size(axis_name)
    k = lax.axis_index(axis_name)
    L = block.shape[1]
    T = n * L
    buf = halo_exchange(block, 1, axis_name)        # (B, L+2, ...)

    i = jnp.arange(2 * L) + 2 * k * L               # global output indices
    src = i.astype(jnp.float32) * (T - 1) / (2 * T - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    w = (src - lo).reshape((1, 2 * L) + (1,) * (block.ndim - 2))
    hi = jnp.minimum(lo + 1, T - 1)
    lo_local = lo - (k * L - 1)
    hi_local = hi - (k * L - 1)
    lo_v = jnp.take(buf, lo_local, axis=1)
    hi_v = jnp.take(buf, hi_local, axis=1)
    return lo_v * (1 - w) + hi_v * w


def upsample2x_t_sp(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Frame-sharded align-corners x2 temporal upsample, numerically equal
    to ``resize_trilinear`` on the T axis (the decoder's upsample,
    models/mygannet.py:50) for T-sharded inputs."""
    fn = shard_map(_upsample2x_t_local, mesh=mesh,
                   in_specs=P(None, "sp"), out_specs=P(None, "sp"))
    return fn(x)


def avg_pool2x_t_sp(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Frame-sharded temporal /2 average pool (encoder downsample).  Purely
    local when the per-shard frame count is even."""
    def local(block):
        b, L = block.shape[:2]
        assert L % 2 == 0, "per-shard frames must be even for local pooling"
        shaped = block.reshape((b, L // 2, 2) + block.shape[2:])
        return shaped.mean(axis=2)

    fn = shard_map(local, mesh=mesh, in_specs=P(None, "sp"),
                   out_specs=P(None, "sp"))
    return fn(x)


def temporal_conv_sp(x: jnp.ndarray, kernel: jnp.ndarray, mesh: Mesh,
                     padding: int | None = None) -> jnp.ndarray:
    """Frame-sharded temporal convolution, numerically identical to the
    unsharded ``temporal_conv(x, kernel, padding=kt//2)``.

    ``x``: global ``(B, T, H, W, C)`` with T divisible by the mesh's sp size;
    ``kernel``: ``(kt, Cin, Cout)`` (odd kt).
    """
    kt = kernel.shape[0]
    halo = kt // 2
    if padding is None:
        padding = halo

    def local(block, kern):
        padded = halo_exchange(block, halo)
        # halos provide the cross-shard context; conv VALID over them
        return temporal_conv(padded, kern, padding=0)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, "sp"), P()),
                   out_specs=P(None, "sp"))
    return fn(x, kernel)
