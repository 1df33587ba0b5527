"""Device mesh + data-parallel sharding helpers.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(SURVEY.md §2.3; models/mygannet.py:232-237).  The TPU-native replacement is
GSPMD data parallelism: a 1-D ``Mesh`` over the ICI axis ``"dp"``, batches
sharded along axis 0, parameters replicated, and ``jit`` inserting the
gradient all-reduce collectives.  This is strictly stronger than
DataParallel (synchronised optimiser state, cross-replica BatchNorm
statistics emerge from the global batch reductions under GSPMD).

An explicit ``shard_map`` halo-exchange path for frame-axis (sequence)
parallelism lives in :mod:`vfd_gan_tpu.parallel.temporal`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def auto_dp(batchsize: int, requested: int = 0, n_devices: int | None = None) -> int:
    """Largest usable dp size: caps the request at the device count and
    shrinks to a divisor of the global batch (sharding needs B % dp == 0)."""
    n = n_devices if n_devices is not None else len(jax.devices())
    dp = requested if requested > 0 else n
    dp = min(dp, n, batchsize)
    while batchsize % dp:
        dp -= 1
    return max(dp, 1)


def make_mesh(dp: int = 0, sp: int = 1, devices=None) -> Mesh:
    """Device mesh: 1-D data-parallel, or 2-D ``(dp, sp)`` when ``sp > 1``.

    The ``sp`` (sequence-parallel) axis shards the clip's frame dimension
    across chips — GSPMD partitions every temporal op in the fused train
    step over it (the shifted-matmul temporal convs become
    collective-permute halo exchanges, BN batch statistics all-reduce over
    both axes).  ``dp=0`` uses every device left after ``sp``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if sp <= 1:
        if dp <= 0:
            dp = len(devices)
        if dp > len(devices):
            raise ValueError(
                f"requested dp={dp} but only {len(devices)} devices")
        return Mesh(np.asarray(devices[:dp]), axis_names=("dp",))
    if dp <= 0:
        dp = len(devices) // sp
    if dp * sp > len(devices):
        raise ValueError(f"requested dp*sp={dp}*{sp} but only "
                         f"{len(devices)} devices")
    return Mesh(np.asarray(devices[:dp * sp]).reshape(dp, sp),
                axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp — and, on a 2-D mesh, the
    second (frame) axis over sp."""
    if "sp" in mesh.axis_names:
        return NamedSharding(mesh, P("dp", "sp"))
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def accum_regroup(mesh: Mesh, x, k: int):
    """``--accum`` helper: reshape ``(k*b, ...)`` -> ``(k, b, ...)`` inside
    jit, constraining the microbatch dim to the dp axis (and the frame dim
    to sp on a 2-D mesh) so GSPMD keeps each microbatch data-parallel
    through the accumulation ``lax.scan``."""
    y = x.reshape((k, x.shape[0] // k) + x.shape[1:])
    spec = (P(None, "dp", "sp")
            if "sp" in mesh.axis_names and y.ndim >= 3 else P(None, "dp"))
    return jax.lax.with_sharding_constraint(y, NamedSharding(mesh, spec))


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding (plus
    frame-axis sharding on a 2-D mesh, for leaves that have a frame axis —
    per-clip labels stay dp-only)."""
    full = batch_sharding(mesh)
    dp_only = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, full if x.ndim >= 2 else dp_only), batch)
