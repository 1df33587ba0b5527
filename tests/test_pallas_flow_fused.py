"""Single-kernel fused flow refinement (ops/pallas/flow_fused.py) vs the
XLA `_flow_level` body — interpret mode on CPU (semantics contract in the
kernel docstring: identical math, v5-band |flow_y| clamp)."""

import numpy as np
import jax.numpy as jnp

from vfd_gan_tpu.ops.flow import (
    _flow_level,
    _flow_level_fused,
    poly_expansion,
)


def _smooth(h, w, seed):
    r = np.random.default_rng(seed)
    base = r.normal(size=(h // 4, w // 4))
    img = np.kron(base, np.ones((4, 4)))
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(img, 3.0)
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return (img * 255).astype(np.float32)


def test_fused_matches_fori_loop_unbanded():
    """32-row planes take the unbanded path (full-height candidate rows):
    the fused kernel must track the XLA body within the bf16 warp/blur
    operand tolerance."""
    h = w = 32
    img = _smooth(h, w, seed=5)
    shifted = np.roll(np.roll(img, 2, axis=0), 1, axis=1)
    both = poly_expansion(jnp.asarray(np.stack([img, shifted])))
    p1, p2 = both[:1], both[1:]
    flow0 = jnp.zeros((1, h, w, 2), jnp.float32)

    want = np.asarray(_flow_level(p1, p2, flow0, winsize=15, iterations=3))
    got = np.asarray(_flow_level_fused(p1, p2, flow0, winsize=15,
                                       iterations=3, interpret=True))
    err = np.abs(got - want)
    assert np.quantile(err, 0.9) < 0.05, np.quantile(err, [0.5, 0.9, 0.99])
    inner = got[0, 8:-8, 8:-8]
    assert abs(np.median(inner[..., 0]) - 1) < 0.5
    assert abs(np.median(inner[..., 1]) - 2) < 0.5


def test_fused_banded_bit_matches_two_kernel_path():
    """64-row planes run the banded warp (band 32, |flow_y| <= 3).  The
    fused kernel must be BIT-IDENTICAL to the production two-kernel
    composition (warp v5 + refine solve, ops/flow._flow_level_pallas):
    same clamp envelope, same bf16/f32 contraction contract, same
    zero-contribution banding — only the dispatch structure differs."""
    from vfd_gan_tpu.ops.flow import _flow_level_pallas

    h = w = 64
    img = _smooth(h, w, seed=7)
    shifted = np.roll(np.roll(img, 2, axis=0), 1, axis=1)
    both = poly_expansion(jnp.asarray(np.stack([img, shifted])))
    p1, p2 = both[:1], both[1:]
    flow0 = jnp.zeros((1, h, w, 2), jnp.float32)

    want = np.asarray(_flow_level_pallas(p1, p2, flow0, winsize=15,
                                         iterations=3, interpret=True))
    got = np.asarray(_flow_level_fused(p1, p2, flow0, winsize=15,
                                       iterations=3, interpret=True))
    np.testing.assert_array_equal(got, want)
    # and it still recovers the planted (+1, +2) translation
    inner = got[0, 16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - 1) < 0.5
    assert abs(np.median(inner[..., 1]) - 2) < 0.5
