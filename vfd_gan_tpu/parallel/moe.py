"""Expert parallelism (Mixture-of-Experts) over an ``ep`` mesh axis.

The reference has no MoE (its only strategy is single-process
``torch.nn.DataParallel``, SURVEY.md §2.3); this is a documented TPU-native
extension completing the mesh-axis family (``dp`` data, ``sp`` sequence,
``tp`` channel tensor, ``pp`` pipeline, ``ep`` expert).

The scheme is GShard-style *dense dispatch* — the XLA-friendly formulation:
a linear router scores each token over E experts; top-1 routing with a
static per-expert capacity C builds a one-hot dispatch tensor
``(T, E, C)``; expert inputs ``(E, C, D)`` come from one einsum against the
tokens, every expert applies its own parameters under ``jax.vmap`` over the
leading expert axis, and a second einsum (weighted by the router gate)
combines outputs back to token order.  Everything is static-shaped — no
sorting, no ragged buffers — so it runs entirely under ``jit``/GSPMD:
expert parameters carry ``P("ep")`` on their leading axis, the dispatched
``(E, C, D)`` blocks are sharding-constrained to ``P("ep")``, and XLA
inserts the token all-to-alls over ICI.

Tokens that overflow an expert's capacity are *dropped* (contribute zero),
the standard GShard/Switch semantics; an auxiliary load-balancing loss
(Switch Transformer eq. 4: E * Σ_e f_e · p_e) pushes the router toward
uniform load so drops vanish in training.  With ``capacity_factor`` such
that C >= T no token can ever drop and the layer equals the dense
per-token expert oracle exactly (the equivalence the tests pin).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def expert_shardings(mesh: Mesh, tree, axis: str = "ep"):
    """Shardings for an expert-stacked pytree: leading (expert) dim over the
    mesh's ``ep`` axis, everything else replicated."""
    def spec(x):
        nd = len(getattr(x, "shape", ()))
        return NamedSharding(mesh, P(*([axis] + [None] * (nd - 1))))
    return jax.tree_util.tree_map(spec, tree)


def capacity(n_tokens: int, n_experts: int, capacity_factor: float) -> int:
    """Static per-expert buffer size C = ceil(cf * T / E), at least 1."""
    return max(1, math.ceil(capacity_factor * n_tokens / n_experts))


def moe_apply(expert_fn, expert_params, router_w, x, *,
              mesh: Mesh | None = None, axis: str = "ep",
              capacity_factor: float = 1.25):
    """Top-1 MoE layer over tokens ``x (T, D)``.

    Args:
      expert_fn: ``(params_one, h (C, D)) -> (C, D_out)`` — one expert on
        its capacity block; applied to all experts via ``vmap`` over the
        stacked params' leading axis.
      expert_params: pytree with leading expert dim E on every leaf
        (shard over ``ep`` with :func:`expert_shardings`).
      router_w: ``(D, E)`` router weights (replicated).
      x: tokens ``(T, D)``.
      mesh: when given, the dispatched expert blocks are
        sharding-constrained to the mesh's ``ep`` axis so GSPMD executes
        expert compute expert-parallel (omit for single-device tests).
      capacity_factor: C = ceil(cf*T/E); tokens routed past C drop (zero
        contribution).  cf*T/E >= T (e.g. ``cf=n_experts``) guarantees no
        drops.

    Returns ``(y (T, D_out), aux)`` where ``aux`` carries the Switch
    load-balancing loss and the dropped-token fraction.
    """
    t, d = x.shape
    e = router_w.shape[-1]
    c = capacity(t, e, capacity_factor)

    logits = x @ router_w                                   # (T, E)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    choice = jnp.argmax(probs, axis=-1)                     # (T,)
    gate = jnp.take_along_axis(probs, choice[:, None], -1)[:, 0]

    onehot = jax.nn.one_hot(choice, e, dtype=jnp.int32)     # (T, E)
    # position of each token within its expert's buffer (arrival order)
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1           # (T, E)
    slot = jnp.max(pos, axis=-1)                            # (T,)
    kept = slot < c
    # dispatch (T, E, C): one-hot over both expert and capacity slot
    disp = (onehot.astype(x.dtype)[:, :, None]
            * jax.nn.one_hot(jnp.clip(slot, 0, c - 1), c, dtype=x.dtype)[
                :, None, :]
            * kept[:, None, None].astype(x.dtype))

    h = jnp.einsum("tec,td->ecd", disp, x)                  # (E, C, D)
    if mesh is not None and axis in mesh.axis_names:
        h = jax.lax.with_sharding_constraint(
            h, NamedSharding(mesh, P(axis)))
    y_e = jax.vmap(expert_fn)(expert_params, h)             # (E, C, D_out)
    if mesh is not None and axis in mesh.axis_names:
        y_e = jax.lax.with_sharding_constraint(
            y_e, NamedSharding(mesh, P(axis)))
    y = jnp.einsum("tec,ecd->td", disp, y_e) * gate[:, None].astype(x.dtype)

    # Switch Transformer load-balancing loss: E * sum_e f_e * p_e
    frac = jnp.mean(onehot.astype(jnp.float32), axis=0)     # tokens/expert
    mean_p = jnp.mean(probs, axis=0)
    aux = {
        "load_balance_loss": e * jnp.sum(frac * mean_p),
        "dropped_frac": 1.0 - jnp.mean(kept.astype(jnp.float32)),
    }
    return y, aux
