"""GPipe pipeline primitive (parallel/pipeline.py) on the virtual mesh.

The reference has no pipeline parallelism (SURVEY.md §2.3 — DataParallel
only); these tests pin the extension's contract: the pipelined chain
equals the sequential per-microbatch oracle exactly — outputs, mutated
per-stage stats in microbatch order, and gradients.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from vfd_gan_tpu.parallel.pipeline import (
    gpipe_apply,
    stack_stages,
    stage_shardings,
    unstack_stages,
)


def _mesh(pp):
    devs = jax.devices()
    if len(devs) < pp:
        pytest.skip(f"need {pp} devices")
    return Mesh(np.asarray(devs[:pp]), axis_names=("pp",))


def _stage_fn(params, stats, x):
    """Toy signature-preserving block with a BN-like running stat."""
    y = jnp.tanh(x @ params["w"] + params["b"])
    new_stats = {"ra": 0.9 * stats["ra"] + 0.1 * jnp.mean(y, axis=0)}
    return y, new_stats


def _make_chain(s_total, width, seed=0):
    ks = jax.random.split(jax.random.key(seed), s_total)
    ps = [{"w": jax.random.normal(k, (width, width)) * 0.3,
           "b": jnp.zeros((width,))} for k in ks]
    ss = [{"ra": jnp.zeros((width,))} for _ in range(s_total)]
    return stack_stages(ps), stack_stages(ss)


def _oracle(stacked_p, stacked_s, x, n_micro, s_total):
    """Sequential per-microbatch chain — the semantics gpipe must match."""
    ps = unstack_stages(stacked_p, s_total)
    ss = unstack_stages(stacked_s, s_total)
    outs = []
    for xm in np.split(np.asarray(x), n_micro):
        h = jnp.asarray(xm)
        for i in range(s_total):
            h, ss[i] = _stage_fn(ps[i], ss[i], h)
        outs.append(h)
    return jnp.concatenate(outs), stack_stages(ss)


@pytest.mark.parametrize("pp,n_micro", [(2, 1), (2, 2), (4, 4), (4, 2)])
def test_gpipe_matches_sequential(pp, n_micro):
    mesh = _mesh(pp)
    s_total, width, batch = 4, 8, 8
    stacked_p, stacked_s = _make_chain(s_total, width)
    x = jax.random.normal(jax.random.key(7), (batch, width))

    y_ref, s_ref = _oracle(stacked_p, stacked_s, x, n_micro, s_total)
    y, s_new = jax.jit(
        lambda p, s, x: gpipe_apply(_stage_fn, p, s, x,
                                    n_micro=n_micro, mesh=mesh))(
        jax.device_put(stacked_p, stage_shardings(mesh, stacked_p)),
        jax.device_put(stacked_s, stage_shardings(mesh, stacked_s)), x)

    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_new),
                    jax.tree_util.tree_leaves(s_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_gpipe_gradients_match_sequential():
    pp, n_micro, s_total, width, batch = 4, 2, 8, 8, 8
    mesh = _mesh(pp)
    stacked_p, stacked_s = _make_chain(s_total, width, seed=3)
    x = jax.random.normal(jax.random.key(11), (batch, width))
    tgt = jax.random.normal(jax.random.key(12), (batch, width))

    def loss_pipe(p, x):
        y, _ = gpipe_apply(_stage_fn, p, stacked_s, x,
                           n_micro=n_micro, mesh=mesh)
        return jnp.mean((y - tgt) ** 2)

    def loss_seq(p, x):
        ps = unstack_stages(p, s_total)
        outs = []
        for xm in jnp.split(x, n_micro):
            h = xm
            for i in range(s_total):
                h, _ = _stage_fn(ps[i], {"ra": jnp.zeros((width,))}, h)
            outs.append(h)
        return jnp.mean((jnp.concatenate(outs) - tgt) ** 2)

    p_sharded = jax.device_put(stacked_p, stage_shardings(mesh, stacked_p))
    g_pipe, gx_pipe = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(
        p_sharded, x)
    g_seq, gx_seq = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(stacked_p, x)

    np.testing.assert_allclose(np.asarray(gx_pipe), np.asarray(gx_seq),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_gpipe_state_is_stage_sharded():
    pp = 4
    mesh = _mesh(pp)
    stacked_p, _ = _make_chain(8, 8)
    p = jax.device_put(stacked_p, stage_shardings(mesh, stacked_p))
    for leaf in jax.tree_util.tree_leaves(p):
        assert leaf.sharding.spec[0] == "pp"
        # each device holds 1/pp of the stage axis
        db = leaf.sharding.shard_shape(leaf.shape)
        assert db[0] == leaf.shape[0] // pp
