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


def make_mesh(dp: int = 0, sp: int = 1, tp: int = 1, pp: int = 1,
              devices=None, ep: int = 1) -> Mesh:
    """Device mesh: 1-D data-parallel, plus optional ``sp``/``tp``/``pp`` axes.

    The ``sp`` (sequence-parallel) axis shards the clip's frame dimension
    across chips — GSPMD partitions every temporal op in the fused train
    step over it (the shifted-matmul temporal convs become
    collective-permute halo exchanges, BN batch statistics all-reduce over
    both axes).  The ``tp`` (tensor-parallel) axis shards every network's
    *channel* dimension — parameters, gradients, Adam moments and BN
    state live split over ``tp`` (see :func:`param_spec`), so per-device
    weight/optimiser memory drops ~1/tp for wide models.  The ``pp``
    (pipeline-parallel) axis carries GPipe stage sharding
    (:mod:`vfd_gan_tpu.parallel.pipeline`): stage-stacked block params /
    Adam moments / BN state live split, with ``ppermute`` activation
    hand-offs between neighbouring devices — ``pp`` is the *last* mesh
    axis so stages are ICI neighbours.  ``dp=0`` uses every device left
    after ``sp*tp*pp``.  Axes with size 1 are omitted, so existing
    1-D/2-D behaviour is unchanged.
    """
    devices = list(devices if devices is not None else jax.devices())
    model = sp * tp * pp * ep
    if dp <= 0:
        dp = max(1, len(devices) // model)
    if dp * model > len(devices):
        raise ValueError(f"requested dp*sp*tp*ep*pp={dp}*{sp}*{tp}*{ep}*{pp} "
                         f"but only {len(devices)} devices")
    names, sizes = ["dp"], [dp]
    if sp > 1:
        names.append("sp")
        sizes.append(sp)
    if tp > 1:
        names.append("tp")
        sizes.append(tp)
    if ep > 1:
        # expert axis (`--moe_shards`): stacked expert params live split
        names.append("ep")
        sizes.append(ep)
    if pp > 1:
        names.append("pp")
        sizes.append(pp)
    n = int(np.prod(sizes))
    return Mesh(np.asarray(devices[:n]).reshape(sizes),
                axis_names=tuple(names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp — and, on a 2-D mesh, the
    second (frame) axis over sp."""
    if "sp" in mesh.axis_names:
        return NamedSharding(mesh, P("dp", "sp"))
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(tp: int, shape) -> P:
    """Tensor-parallel placement of one parameter/stat leaf.

    Megatron-style column sharding generalised to this framework's kernels:
    the *trailing* axis of every leaf is its output-channel dimension
    (spatial kernels ``(kh, kw, Cin, Cout)``, temporal kernels
    ``(kt, Cin, Cout)``, biases/BN scale/bias/running stats ``(C,)``,
    dense ``(in, out)``) — shard it over ``tp`` whenever it divides
    evenly; anything else (scalars such as Adam's ``count``, channel dims
    not divisible by ``tp``, e.g. the 1-channel mask head) stays
    replicated.  GSPMD inserts the activation collectives this implies.
    """
    if tp > 1 and len(shape) >= 1 and shape[-1] and shape[-1] % tp == 0:
        return P(*([None] * (len(shape) - 1) + ["tp"]))
    return P()


def state_shardings(mesh: Mesh, tree):
    """Shardings pytree for a network state (params + BN stats + Adam
    moments): channel-sharded over the mesh's ``tp`` axis when present,
    expert-stacked MoE leaves (path contains ``experts``, leading dim
    divisible) over its ``ep`` axis, replicated otherwise.  ``tree`` may
    hold concrete arrays or the ``jax.eval_shape`` structs of an init
    function — anything with ``.shape``."""
    shape_map = dict(mesh.shape)
    tp = shape_map.get("tp", 1)
    ep = shape_map.get("ep", 1)

    def spec_for(path, x):
        if (ep > 1 and len(x.shape) >= 1 and x.shape[0]
                and x.shape[0] % ep == 0
                and any("experts" in str(k) for k in path)):
            return NamedSharding(
                mesh, P(*(["ep"] + [None] * (len(x.shape) - 1))))
        return NamedSharding(mesh, param_spec(tp, x.shape))

    return jax.tree_util.tree_map_with_path(spec_for, tree)


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
