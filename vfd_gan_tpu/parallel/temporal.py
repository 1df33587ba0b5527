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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
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
