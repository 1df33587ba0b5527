"""Residual token-MoE block — the flax consumer of ``parallel/moe.py``.

The reference has no MoE anywhere (its only parallelism is DataParallel,
SURVEY.md §2.3); this is a *documented TPU-native extension* giving the
GShard dense-dispatch primitive a real model consumer: an opt-in
``--moe_experts N`` variant of the Xception-3D family inserts this block
after the eight middle blocks, routing every spatio-temporal position
(token) of the 728-channel trunk through one of N expert MLPs with a
residual add.  Expert parameters are stacked on a leading expert axis
(names prefixed ``experts_``) which ``parallel.mesh.state_shardings``
shards over the mesh's ``ep`` axis, so expert compute runs
expert-parallel under GSPMD (``--moe_shards``).

The Switch load-balancing loss is sown into the ``moe_aux`` collection;
the supervised engine adds it to the objective at ``--moe_aux_w``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vfd_gan_tpu.parallel.moe import moe_apply

Dtype = Any


class MoEMlp(nn.Module):
    """Top-1 token MoE over ``(B, T, H, W, C)`` features: per-token router,
    N two-layer ReLU expert MLPs (C -> C -> C), residual output.

    ``mesh`` (optional) lets :func:`vfd_gan_tpu.parallel.moe.moe_apply`
    constrain the dispatched expert blocks to the ``ep`` axis; without it
    the layer runs replicated (single-device tests, eval CLIs)."""

    n_experts: int
    capacity_factor: float = 2.0
    dtype: Dtype = jnp.float32
    mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        e = self.n_experts
        router = self.param("router", nn.initializers.normal(0.02), (c, e))
        experts = {
            "w1": self.param("experts_w1", nn.initializers.normal(0.02),
                             (e, c, c)),
            "b1": self.param("experts_b1", nn.initializers.zeros, (e, c)),
            "w2": self.param("experts_w2", nn.initializers.normal(0.02),
                             (e, c, c)),
            "b2": self.param("experts_b2", nn.initializers.zeros, (e, c)),
        }
        tokens = x.reshape(-1, c).astype(self.dtype)

        def expert_fn(p, h):
            h = nn.relu(h @ p["w1"].astype(h.dtype) + p["b1"].astype(h.dtype))
            return h @ p["w2"].astype(h.dtype) + p["b2"].astype(h.dtype)

        y, aux = moe_apply(expert_fn, experts, router, tokens,
                           mesh=self.mesh,
                           capacity_factor=self.capacity_factor)
        # only the trainable balance term is sown — the engine sums this
        # collection into the loss (dropped_frac would poison it)
        self.sow("moe_aux", "load_balance_loss", aux["load_balance_loss"])
        return x + y.reshape(x.shape).astype(x.dtype)
