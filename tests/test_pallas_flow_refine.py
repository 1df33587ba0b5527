"""Pallas flow-refinement kernel vs the XLA `_flow_level` body
(interpret mode; semantics contract in ops/pallas/flow_refine.py)."""

import numpy as np
import jax.numpy as jnp

from vfd_gan_tpu.ops.flow import (
    _box_blur_stack,
    _flow_level,
    _flow_level_pallas,
    poly_expansion,
)
from vfd_gan_tpu.ops.pallas.flow_refine import flow_refine_step_pallas

rng = np.random.default_rng(33)


def _smooth(h, w, seed):
    r = np.random.default_rng(seed)
    base = r.normal(size=(h // 4, w // 4))
    img = np.kron(base, np.ones((4, 4)))
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(img, 3.0)
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return (img * 255).astype(np.float32)


def _xla_body_once(p1, w2, flow, winsize):
    """One `_flow_level` body iteration with the warp already applied —
    the exact algebra/blur/solve the kernel must reproduce."""
    b1x, b1y = p1[..., 0], p1[..., 1]
    a1xx, a1yy, a1xy = p1[..., 2], p1[..., 3], p1[..., 4]
    fx, fy = flow[..., 0], flow[..., 1]
    axx = (a1xx + w2[..., 2]) * 0.5
    ayy = (a1yy + w2[..., 3]) * 0.5
    axy = ((a1xy + w2[..., 4]) * 0.5) * 0.5
    dbx = -0.5 * (w2[..., 0] - b1x) + axx * fx + axy * fy
    dby = -0.5 * (w2[..., 1] - b1y) + axy * fx + ayy * fy
    quants = jnp.stack([
        axx * axx + axy * axy,
        axy * (axx + ayy),
        ayy * ayy + axy * axy,
        axx * dbx + axy * dby,
        axy * dbx + ayy * dby,
    ], axis=-1)
    g11, g12, g22, h1, h2 = jnp.moveaxis(
        _box_blur_stack(quants, winsize), -1, 0)
    det = g11 * g22 - g12 * g12
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    return jnp.stack([(g22 * h1 - g12 * h2) / det,
                      (g11 * h2 - g12 * h1) / det], axis=-1)


def test_refine_step_matches_xla_body():
    # Well-conditioned coefficients (quadratic terms ~1, small linear
    # terms) keep the 2x2 solve far from the det clamp so the comparison
    # probes the algebra + blur, not clamp-amplified noise.
    n, h, w = 2, 32, 48
    p1 = np.concatenate([
        rng.normal(size=(n, h, w, 2)).astype(np.float32) * 0.1,   # bx, by
        1.0 + rng.normal(size=(n, h, w, 2)).astype(np.float32) * 0.05,
        rng.normal(size=(n, h, w, 1)).astype(np.float32) * 0.05,  # axy
    ], axis=-1)
    w2 = p1 + rng.normal(size=p1.shape).astype(np.float32) * 0.02
    flow = rng.normal(size=(n, h, w, 2)).astype(np.float32) * 0.5

    want = np.asarray(_xla_body_once(jnp.asarray(p1), jnp.asarray(w2),
                                     jnp.asarray(flow), winsize=15))
    got = flow_refine_step_pallas(
        jnp.moveaxis(jnp.asarray(p1), -1, 1),
        jnp.moveaxis(jnp.asarray(w2), -1, 1),
        jnp.moveaxis(jnp.asarray(flow), -1, 1), 15, interpret=True)
    got = np.asarray(jnp.moveaxis(got, 1, -1))
    # both paths blur with bf16 operands; only reduction order differs
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_flow_level_pallas_matches_fori_loop():
    # The production TPU composition (warp kernel + refine kernel,
    # 3 iterations) vs the XLA fori_loop body on realistic expansions of
    # a shifted textured image.  The warp kernel's bf16 two-hot weights
    # bound the per-iteration divergence (ops/pallas/warp.py WARP_DTYPE).
    h = w = 64
    img = _smooth(h, w, seed=5)
    shifted = np.roll(np.roll(img, 2, axis=0), 1, axis=1)
    both = poly_expansion(jnp.asarray(np.stack([img, shifted])))
    p1, p2 = both[:1], both[1:]
    flow0 = jnp.zeros((1, h, w, 2), jnp.float32)

    want = np.asarray(_flow_level(p1, p2, flow0, winsize=15, iterations=3))
    got = np.asarray(_flow_level_pallas(p1, p2, flow0, winsize=15,
                                        iterations=3, interpret=True))
    err = np.abs(got - want)
    # flat-texture pockets amplify tiny operand differences through the
    # det clamp; the bulk of the field must agree tightly
    assert np.quantile(err, 0.9) < 0.05, np.quantile(err, [0.5, 0.9, 0.99])
    # and both must recover the planted (+1, +2) translation
    inner_got = got[0, 16:-16, 16:-16]
    assert abs(np.median(inner_got[..., 0]) - 1) < 0.5
    assert abs(np.median(inner_got[..., 1]) - 2) < 0.5
