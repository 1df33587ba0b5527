"""Pipeline-parallel Xception-3D: GPipe over the 8 middle blocks.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(SURVEY.md §2.3; its Xception trunk, models/xception.py:107-115, is the one
family with a deep uniform-signature chain).  This module stage-shards that
chain over the mesh's ``pp`` axis with the generic GPipe primitive
(:func:`vfd_gan_tpu.parallel.pipeline.gpipe_apply`):

* the 8 identity 728-channel blocks' params / Adam moments / BN state are
  *stacked* along a leading stage axis and sharded over ``pp`` — each device
  holds ``8/pp`` blocks of the network's dominant parameter mass;
* ``front`` (stem + entry blocks) and ``back`` (exit + heads + decoder) stay
  replicated under plain-GSPMD jit, computing full-batch BN statistics;
* the pipelined chain runs ``cfg.n_pp_micro`` microbatches per step with
  per-microbatch BN statistics (the ``--accum`` contract), activations
  handed stage-to-stage by ``lax.ppermute``;
* composes with ``dp``: each microbatch's batch dim shards over the ``dp``
  axis, and the stage blocks' BN reduces over it explicitly
  (``axis_name="dp"`` -> ``lax.pmean``) so batch statistics stay global.

Checkpoints remain in the *canonical* (unstacked ``middle1..middle8``)
layout — :func:`unstack_state` / :func:`stack_state` convert whole
``NetState`` trees (params, BN stats, and Adam ``mu``/``nu``) losslessly, so
pp and non-pp runs share checkpoints and the ``.pth`` converters unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vfd_gan_tpu.models.xception3d import (
    N_MIDDLE_BLOCKS,
    Xception3D,
    XceptionBlock,
)
from vfd_gan_tpu.parallel.pipeline import (
    gpipe_apply,
    stack_stages,
    unstack_stages,
)

STACKED = "middle_stacked"


# -- canonical <-> pipelined tree layout -------------------------------------

def stack_middles(tree: dict) -> dict:
    """``{middle1..middle8, ...} -> {middle_stacked, ...}`` (one params or
    batch_stats collection)."""
    t = dict(tree)
    mids = [t.pop(f"middle{i + 1}") for i in range(N_MIDDLE_BLOCKS)]
    t[STACKED] = stack_stages(mids)
    return t


def unstack_middles(tree: dict) -> dict:
    """Inverse of :func:`stack_middles`."""
    t = dict(tree)
    mids = unstack_stages(t.pop(STACKED), N_MIDDLE_BLOCKS)
    for i, m in enumerate(mids):
        t[f"middle{i + 1}"] = m
    return t


def _map_opt_state(f, opt_state):
    """Apply ``f`` to every params-shaped tree inside an optax state
    (Adam's ``mu``/``nu``; scalar counts and empty states pass through)."""
    def conv(entry):
        if hasattr(entry, "mu") and hasattr(entry, "nu"):
            return entry._replace(mu=f(entry.mu), nu=f(entry.nu))
        return entry
    return tuple(conv(e) for e in opt_state)


def stack_state(state):
    """Canonical ``NetState`` -> pipelined (middle blocks stacked)."""
    return state.replace(
        params=stack_middles(state.params),
        batch_stats=stack_middles(state.batch_stats),
        opt_state=_map_opt_state(stack_middles, state.opt_state))


def unstack_state(state):
    """Pipelined ``NetState`` -> canonical (checkpoint/interchange layout)."""
    return state.replace(
        params=unstack_middles(state.params),
        batch_stats=unstack_middles(state.batch_stats),
        opt_state=_map_opt_state(unstack_middles, state.opt_state))


def pp_state_shardings(mesh: Mesh, tree):
    """Shardings for a pipelined ``NetState``: stacked-middle leaves carry
    their leading stage dim on ``pp``; everything else is replicated.
    ``tree`` may hold arrays or ``jax.eval_shape`` structs."""
    def spec(path, x):
        if any(getattr(p, "key", None) == STACKED for p in path):
            nd = len(x.shape)
            return NamedSharding(mesh, P(*(["pp"] + [None] * (nd - 1))))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(spec, tree)


# -- pipelined forward passes -------------------------------------------------

class XceptionPipeline:
    """Pipelined train/eval forwards for one :class:`Xception3D` instance.

    Stateless beyond configuration: both ``apply_*`` methods are pure
    functions of (params, batch_stats, inputs) and jit/grad-safe.
    """

    def __init__(self, model: Xception3D, mesh: Mesh, n_micro: int):
        self.model = model
        self.mesh = mesh
        self.n_micro = n_micro
        self.batch_axis = "dp" if dict(mesh.shape).get("dp", 1) > 1 else None
        # Standalone stage block — identical param tree to one bound
        # middle{i} submodule.  Inside shard_map the dp axis is explicit,
        # so its BN reduces over it by name to keep global-batch stats.
        self.stage_block = XceptionBlock(
            model._w(728), 3, 1, True, True, dtype=model.dtype,
            axis_name=self.batch_axis)

    # one pipeline stage, training mode (mutates BN batch stats)
    def _stage_train(self, p, s, xm):
        y, mut = self.stage_block.apply(
            {"params": p, "batch_stats": s}, xm, True,
            mutable=["batch_stats"])
        return y, mut["batch_stats"]

    def _stage_eval(self, p, s, xm):
        return self.stage_block.apply(
            {"params": p, "batch_stats": s}, xm, False), s

    def _split(self, params, bstats):
        p_fb = {k: v for k, v in params.items() if k != STACKED}
        s_fb = {k: v for k, v in bstats.items() if k != STACKED}
        return p_fb, s_fb

    def apply_train(self, params, bstats, x, drop_key):
        """Full training forward: front (full-batch BN) -> pipelined middles
        (per-microbatch BN) -> back.  Returns ``(pred, new_batch_stats)``;
        differentiable w.r.t. ``params``."""
        p_fb, s_fb = self._split(params, bstats)
        h, mut = self.model.apply(
            {"params": p_fb, "batch_stats": s_fb}, x, True,
            method=Xception3D.front, mutable=["batch_stats"])
        s_fb = {**s_fb, **mut["batch_stats"]}
        h, new_mid = gpipe_apply(
            self._stage_train, params[STACKED], bstats[STACKED], h,
            n_micro=self.n_micro, mesh=self.mesh,
            batch_axis=self.batch_axis)
        pred, mut = self.model.apply(
            {"params": p_fb, "batch_stats": s_fb}, h, True,
            method=Xception3D.back, mutable=["batch_stats"],
            rngs={"dropout": drop_key})
        new_bstats = {**s_fb, **mut["batch_stats"], STACKED: new_mid}
        return pred, new_bstats

    def apply_eval(self, params, bstats, x):
        p_fb, s_fb = self._split(params, bstats)
        fb = {"params": p_fb, "batch_stats": s_fb}
        h = self.model.apply(fb, x, False, method=Xception3D.front)
        h, _ = gpipe_apply(
            self._stage_eval, params[STACKED], bstats[STACKED], h,
            n_micro=1, mesh=self.mesh, batch_axis=self.batch_axis)
        return self.model.apply(fb, h, False, method=Xception3D.back)
