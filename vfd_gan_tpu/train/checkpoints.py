"""Orbax checkpointing with the reference's best-metric naming scheme.

The reference saves ``{head}_ep{epoch:04d}_netG.pth`` / ``_netD.pth`` pairs
on ROC/PR improvement (lib/train_gan.py:52-57) and
``{head}-{score:04d}_step{step:04d}.pth`` for supervised models
(lib/train_stcnn.py:136-140).  We keep the trigger and naming shape but
store *full* train state via Orbax: params, BN stats, optimiser state, step,
plus a ``loop`` sub-tree (engine RNG key data, epoch/batch cursor, iterator
pass counters, best-metric trackers — see ``EngineBase._loop_state``).
Resume is bit-exact (tests/test_exact_resume.py), unlike the reference which
dropped Adam moments and RNG (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _as_abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (overwrites an existing checkpoint at ``path``)."""
    path = _as_abspath(path)
    ckptr = ocp.StandardCheckpointer()
    tree = jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Any = None) -> Any:
    """Restore a pytree; with ``target`` the result matches its structure."""
    path = _as_abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(path)
    target = jax.tree_util.tree_map(np.asarray, jax.device_get(target))
    return ckptr.restore(path, target)


def best_ckpt_name(head: str, epoch: int, net: str | None = None) -> str:
    """Reference-style checkpoint directory names."""
    if net is None:
        return f"{head}_ep{epoch:04d}"
    return f"{head}_ep{epoch:04d}_{net}"
