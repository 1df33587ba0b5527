"""Expert-parallel MoE primitive (parallel/moe.py) on the virtual mesh.

The reference has no MoE (SURVEY.md §2.3 — DataParallel only); these tests
pin the extension's contract: with no capacity drops the dense-dispatch
layer equals the per-token expert oracle exactly (outputs and gradients),
capacity overflow drops deterministically in arrival order, and expert
params/compute actually shard over the ``ep`` axis.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vfd_gan_tpu.parallel.moe import (
    capacity,
    expert_shardings,
    moe_apply,
)

E, D, T = 4, 8, 16


def _mesh(ep):
    devs = jax.devices()
    if len(devs) < ep:
        pytest.skip(f"need {ep} devices")
    return Mesh(np.asarray(devs[:ep]), axis_names=("ep",))


def _expert_fn(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _setup(seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    params = {"w": jax.random.normal(ks[0], (E, D, D)) * 0.4,
              "b": jnp.zeros((E, D))}
    router = jax.random.normal(ks[1], (D, E))
    x = jax.random.normal(ks[2], (T, D))
    return params, router, x


def _oracle(params, router, x):
    """Dense per-token routing: every token to its argmax expert, gated."""
    probs = jax.nn.softmax((x @ router).astype(jnp.float32), -1)
    choice = jnp.argmax(probs, -1)
    gate = jnp.take_along_axis(probs, choice[:, None], -1)[:, 0]
    outs = jnp.stack([_expert_fn({"w": params["w"][e], "b": params["b"][e]},
                                 x) for e in range(E)])      # (E, T, D)
    y = jnp.take_along_axis(outs, choice[None, :, None], 0)[0]
    return y * gate[:, None]


def test_matches_dense_oracle_no_drops():
    params, router, x = _setup()
    y, aux = jax.jit(lambda p, r, x: moe_apply(
        _expert_fn, p, r, x, capacity_factor=float(E)))(params, router, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_oracle(
        params, router, x)), rtol=1e-5, atol=1e-6)
    assert float(aux["dropped_frac"]) == 0.0


def test_gradients_match_dense_oracle():
    params, router, x = _setup(seed=3)
    tgt = jax.random.normal(jax.random.key(9), (T, D))

    def loss_moe(p, r):
        y, _ = moe_apply(_expert_fn, p, r, x, capacity_factor=float(E))
        return jnp.mean((y - tgt) ** 2)

    def loss_dense(p, r):
        return jnp.mean((_oracle(p, r, x) - tgt) ** 2)

    g1 = jax.jit(jax.grad(loss_moe, argnums=(0, 1)))(params, router)
    g2 = jax.jit(jax.grad(loss_dense, argnums=(0, 1)))(params, router)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_capacity_drops_overflow_tokens():
    """All tokens routed to one expert + capacity 1: only the first token
    contributes; the rest drop to zero output."""
    params, _, x = _setup(seed=5)
    router = jnp.zeros((D, E))  # uniform logits; argmax ties break to 0
    assert capacity(T, E, 0.25) == 1
    y, aux = moe_apply(_expert_fn, params, router, x, capacity_factor=0.25)
    y = np.asarray(y)
    assert np.abs(y[0]).sum() > 0
    np.testing.assert_array_equal(y[1:], 0.0)
    np.testing.assert_allclose(float(aux["dropped_frac"]), (T - 1) / T)


def test_expert_parallel_matches_single_device():
    mesh = _mesh(4)
    params, router, x = _setup(seed=7)
    y_ref, _ = moe_apply(_expert_fn, params, router, x,
                         capacity_factor=float(E))
    p_sh = jax.device_put(params, expert_shardings(mesh, params))
    for leaf in jax.tree_util.tree_leaves(p_sh):
        assert leaf.sharding.spec[0] == "ep"
        assert leaf.sharding.shard_shape(leaf.shape)[0] == leaf.shape[0] // 4
    y, aux = jax.jit(lambda p, r, x: moe_apply(
        _expert_fn, p, r, x, mesh=mesh, capacity_factor=float(E)))(
        p_sh, router, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    assert float(aux["dropped_frac"]) == 0.0


def test_load_balance_loss_prefers_uniform():
    params, _, x = _setup(seed=11)
    uniform = jnp.zeros((D, E))                  # softmax uniform
    _, aux_u = moe_apply(_expert_fn, params, uniform, x,
                         capacity_factor=float(E))
    skew = jnp.zeros((D, E)).at[0, 0].set(50.0)  # collapse onto expert 0
    xs = x.at[:, 0].set(jnp.abs(x[:, 0]) + 1.0)
    _, aux_s = moe_apply(_expert_fn, params, skew, xs,
                         capacity_factor=float(E))
    assert float(aux_s["load_balance_loss"]) \
        > float(aux_u["load_balance_loss"])
