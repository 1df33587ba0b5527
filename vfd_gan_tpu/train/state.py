"""Functional training state for one network.

Replaces the reference's implicit (module, optimiser) pairs with an explicit
pytree: parameters, BatchNorm running statistics, and Adam state — all of
which are checkpointed (unlike the reference, which dropped optimiser state
and RNG on resume; SURVEY.md §5 checkpoint notes).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


def make_adam(lr: float, beta1: float = 0.5) -> optax.GradientTransformation:
    """Adam with the reference's hyperparameters: betas (beta1, 0.999),
    torch-default eps 1e-8 (models/mygannet.py:270-273)."""
    return optax.adam(lr, b1=beta1, b2=0.999, eps=1e-8)


@flax.struct.dataclass
class NetState:
    """Parameters + BN stats + optimiser state for one network."""

    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation) -> "NetState":
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )

    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}

    def apply_grads(self, tx: optax.GradientTransformation, grads,
                    new_batch_stats=None) -> "NetState":
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            batch_stats=(self.batch_stats if new_batch_stats is None
                         else new_batch_stats),
            opt_state=new_opt,
        )


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
