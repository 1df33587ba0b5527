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
import threading
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _as_abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def _save_host_tree(path: str, host_tree: Any) -> None:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_as_abspath(path), host_tree, force=True)
    ckptr.wait_until_finished()


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (overwrites an existing checkpoint at ``path``)."""
    _save_host_tree(path,
                    jax.tree_util.tree_map(np.asarray, jax.device_get(tree)))


class AsyncSaver:
    """Overlap checkpoint serialisation/IO with training (``--autosave_async``).

    ``save`` fetches the state to host synchronously (JAX arrays are
    immutable, but the fused steps DONATE their input buffers — the fetch
    must complete before the next step invalidates them), then hands the
    Orbax write to a background thread so the training loop resumes while
    bytes hit disk.  Single-flight: if the previous write is still in
    progress the new save is SKIPPED (returns False) rather than queued —
    a rolling ``latest`` only needs the most recent state, and two
    writers on one path would race.  ``wait()`` joins the in-flight write
    (call before process exit, final saves, or restoring the same path).
    No reference equivalent (the reference has no autosave at all,
    SURVEY.md §5 failure recovery).
    """

    def __init__(self):
        self._thread: threading.Thread | None = None

    def save(self, path: str, tree: Any) -> bool:
        if self._thread is not None and self._thread.is_alive():
            return False
        host = jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
        self._thread = threading.Thread(
            target=_save_host_tree, args=(path, host), daemon=True)
        self._thread.start()
        return True

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None


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
