"""Pipeline parallelism (GPipe) over a chain of same-signature blocks.

The reference has no pipeline parallelism (its only strategy is
single-process ``torch.nn.DataParallel``, SURVEY.md §2.3); this is a
documented TPU-native extension completing the mesh-axis family
(``dp`` data, ``sp`` sequence, ``tp`` channel tensor, ``pp`` pipeline).

The scheme is classic GPipe on a chain of S blocks with identical input
and output signatures (here: Xception-3D's eight 728-channel middle
blocks, reference xception.py:107-117).  Block parameters are *stacked*
along a leading stage axis and sharded over the mesh's ``pp`` axis, so
each device holds S/pp blocks' params/optimiser state — the dominant
parameter mass of the network lives split.  The batch is cut into M
microbatches; a ``lax.scan`` over M + pp - 1 ticks runs the pipeline,
with ``lax.ppermute`` handing activations to the next stage each tick.
Bubbles (ticks where a stage has no valid microbatch) compute on a zero
buffer and are masked out of both the output and the BatchNorm
running-stat updates.

Differentiable end to end: ``shard_map`` + ``scan`` + ``ppermute`` all
transpose, so ``jax.grad`` of a loss through :func:`gpipe_apply` yields
exact gradients for the stacked (sharded) block params as well as
everything upstream/downstream.

Semantics note (mirrors ``--accum``): with M > 1 microbatches, the
pipelined blocks' BatchNorm *batch* statistics are per-microbatch, and
running stats update once per microbatch in order — identical to
running the chain sequentially per microbatch on one device, which is
exactly what the equivalence tests assert.  M = 1 is bit-identical to
the unpipelined forward (no overlap, pure inter-layer model
parallelism).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stages(stage_trees):
    """Stack a list of per-stage pytrees (identical structure/shapes) into
    one pytree with a leading stage axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stage_trees)


def unstack_stages(stacked, n: int):
    """Inverse of :func:`stack_stages`."""
    return [jax.tree_util.tree_map(lambda a: a[i], stacked) for i in range(n)]


def stage_shardings(mesh: Mesh, tree, axis: str = "pp"):
    """Shardings for a stage-stacked pytree: leading (stage) dim over the
    mesh's ``pp`` axis, everything else replicated."""
    def spec(x):
        nd = getattr(x, "ndim", len(getattr(x, "shape", ())))
        return NamedSharding(mesh, P(*([axis] + [None] * (nd - 1))))
    return jax.tree_util.tree_map(spec, tree)


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b)


def gpipe_apply(stage_fn, stacked_params, stacked_stats, x, *,
                n_micro: int, mesh: Mesh, axis: str = "pp",
                batch_axis: str | None = None):
    """Run ``x`` through the stage chain on the mesh's ``pp`` axis.

    Args:
      stage_fn: ``(params_one, stats_one, xm) -> (ym, new_stats_one)`` —
        one block, signature-preserving (``ym.shape == xm.shape``).  The
        per-stage stats tree may be empty.
      stacked_params / stacked_stats: pytrees whose leaves carry a leading
        stage dim S (total blocks).  S must be a multiple of the ``pp``
        axis size; each device runs S/pp consecutive blocks.
      x: global batch ``(B, ...)`` with ``B % n_micro == 0``.
      n_micro: number of GPipe microbatches M.
      batch_axis: optional second mesh axis (e.g. ``"dp"``) to shard each
        microbatch's batch dim over — dp x pp composition.  ``stage_fn``
        then sees the *local* batch shard; batch-statistic layers inside it
        must reduce over ``batch_axis`` themselves (``lax.pmean``) to keep
        global-batch semantics, since inside ``shard_map`` the batch axis
        is explicit rather than GSPMD-implicit.

    Returns ``(y, new_stacked_stats)`` with ``y.shape == x.shape`` and the
    stats tree updated once per (stage, microbatch) in microbatch order.
    """
    pp = dict(mesh.shape)[axis]
    flat = jax.tree_util.tree_leaves(stacked_params)
    s_total = flat[0].shape[0] if flat else pp
    if s_total % pp:
        raise ValueError(f"{s_total} stages do not divide over pp={pp}")
    k = s_total // pp  # blocks per device
    b, m = x.shape[0], n_micro
    if b % m:
        raise ValueError(f"batch {b} not divisible by n_micro {m}")
    if batch_axis is not None:
        dpn = dict(mesh.shape)[batch_axis]
        if (b // m) % dpn:
            raise ValueError(f"microbatch {b // m} not divisible by "
                             f"{batch_axis}={dpn}")
    x_mb = x.reshape((m, b // m) + x.shape[1:])

    def local_chain(p_loc, s_loc, xm):
        """Apply this device's k consecutive blocks (static unroll)."""
        new_s = []
        for i in range(k):
            pi = jax.tree_util.tree_map(lambda a: a[i], p_loc)
            si = jax.tree_util.tree_map(lambda a: a[i], s_loc)
            xm, si = stage_fn(pi, si, xm)
            new_s.append(si)
        return xm, stack_stages(new_s) if new_s and jax.tree_util.tree_leaves(
            new_s[0]) else s_loc

    def body(p_loc, s_loc, x_all):
        d = lax.axis_index(axis)
        n = lax.axis_size(axis)
        acts0 = jnp.zeros_like(x_all[0])
        y0 = jnp.zeros_like(x_all)

        def tick(carry, t):
            acts, y, s = carry
            feed = lax.dynamic_index_in_dim(
                x_all, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            inp = jnp.where(d == 0, feed, acts)
            mb = t - d                         # microbatch index at stage d
            valid = (mb >= 0) & (mb < m)
            out, s_new = local_chain(p_loc, s, inp)
            s = _tree_where(valid, s_new, s)
            nxt = lax.ppermute(out, axis,
                               [(i, (i + 1) % n) for i in range(n)])
            upd = lax.dynamic_update_index_in_dim(
                y, out, jnp.clip(mb, 0, m - 1), 0)
            y = jnp.where(valid & (d == n - 1), upd, y)
            return (nxt, y, s), None

        (_, y, s), _ = lax.scan(tick, (acts0, y0, s_loc),
                                jnp.arange(m + n - 1))
        # only the last stage holds the real output; make it replicated
        y = lax.psum(jnp.where(d == n - 1, y, jnp.zeros_like(y)), axis)
        return y, s

    lead = P(axis)
    xspec = P(None, batch_axis) if batch_axis is not None else P()
    stage_spec_p = jax.tree_util.tree_map(lambda _: lead, stacked_params)
    stage_spec_s = jax.tree_util.tree_map(lambda _: lead, stacked_stats)
    y_mb, new_stats = shard_map(
        body, mesh=mesh,
        in_specs=(stage_spec_p, stage_spec_s, xspec),
        out_specs=(xspec, stage_spec_s),
        check_vma=False,
    )(stacked_params, stacked_stats, x_mb)
    return y_mb.reshape(x.shape), new_stats
