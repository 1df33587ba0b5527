"""Pallas TPU kernel: one Farneback refinement solve, whole-plane in VMEM.

The refinement body of ``ops/flow._flow_level`` (reference hot spot: the cv2
Farneback call, lib/utils.py:94-129) is, per iteration: elementwise algebra
building the 2x2 normal-equation quantities from the warped polynomial
coefficients, a winsize-15 box blur of those five quantity maps, and a
closed-form 2x2 solve.  Under XLA this lowers into the profiled
``while``-loop fusions costing ~2.3 ms/iteration at 128^2 (round-4 trace:
8.6 ms of while self-time) — ~5x the logical memory traffic, paid in
relayout copies between the elementwise layouts and the box-blur batched
GEMMs (the quantity stack crosses a layout domain both ways, and the loop
carry pins layouts; unrolling measured an exact tie, BENCH_NOTES.md).

This kernel runs the whole body for ONE field per grid step with every map
resident in VMEM as an (H, W) plane:

* algebra on f32 planes (VPU, ~40 ops x H*W — trivial);
* box blur as two small MXU matmuls per quantity against the same banded
  replicate-boundary correlation matrices the XLA path uses
  (``ops/flow._corr_matrix``), bf16 operands + f32 accumulation exactly like
  ``CORR_DTYPE`` (one W-axis right-multiply, one H-axis left-multiply);
* the 2x2 solve with the identical 1e-9 det clamp.

Zero HBM round-trips for intermediates: per field only p1/w2/flow stream in
(~0.8 MB) and the updated flow streams out.  The bilinear warp between
iterations stays in the tuned one-hot-matmul kernel (ops/pallas/warp.py);
``ops/flow._flow_level`` alternates the two calls on TPU backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _refine_kernel(p1_ref, w2_ref, flow_ref, mwt_ref, mh_ref, out_ref):
    """One field's refinement solve.

    p1_ref/w2_ref: (1, 5, H, W) f32 polynomial coefficient planes
    (bx, by, axx, ayy, axy) of frame 1 / warped frame 2; flow_ref/out_ref:
    (1, 2, H, W) f32 (x, y) displacement planes; mwt_ref: (W, W) bf16
    box-blur matrix (right-multiply = W-axis pass); mh_ref: (H, H) bf16
    (left-multiply = H-axis pass).
    """
    b1x, b1y = p1_ref[0, 0], p1_ref[0, 1]
    a1xx, a1yy, a1xy = p1_ref[0, 2], p1_ref[0, 3], p1_ref[0, 4]
    w2bx, w2by = w2_ref[0, 0], w2_ref[0, 1]
    w2xx, w2yy, w2xy = w2_ref[0, 2], w2_ref[0, 3], w2_ref[0, 4]
    fx, fy = flow_ref[0, 0], flow_ref[0, 1]

    # average quadratic term, difference of linear terms (ops/flow.py body)
    axx = (a1xx + w2xx) * 0.5
    ayy = (a1yy + w2yy) * 0.5
    axy = ((a1xy + w2xy) * 0.5) * 0.5          # off-diagonal of A
    dbx = -0.5 * (w2bx - b1x) + axx * fx + axy * fy
    dby = -0.5 * (w2by - b1y) + axy * fx + ayy * fy

    mwt = mwt_ref[...]
    mh = mh_ref[...]

    def blur(q):
        # W pass then H pass, bf16 operands / f32 accumulation — the same
        # precision contract as ops/flow.CORR_DTYPE banded matmuls.
        t = jnp.dot(q.astype(mwt.dtype), mwt,
                    preferred_element_type=jnp.float32)
        return jnp.dot(mh, t.astype(mh.dtype),
                       preferred_element_type=jnp.float32)

    g11 = blur(axx * axx + axy * axy)
    g12 = blur(axy * (axx + ayy))
    g22 = blur(ayy * ayy + axy * axy)
    h1 = blur(axx * dbx + axy * dby)
    h2 = blur(axy * dbx + ayy * dby)

    det = g11 * g22 - g12 * g12
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    out_ref[0, 0] = (g22 * h1 - g12 * h2) / det
    out_ref[0, 1] = (g11 * h2 - g12 * h1) / det


def _blur_matrices(h: int, w: int, winsize: int):
    """The XLA path's replicate-boundary box-blur matrices, bf16."""
    from vfd_gan_tpu.ops.flow import CORR_DTYPE, _corr_matrix

    taps = tuple(np.full((winsize,), 1.0 / winsize, np.float32).tolist())
    mwt = jnp.asarray(_corr_matrix(w, taps).T, CORR_DTYPE)
    mh = jnp.asarray(_corr_matrix(h, taps), CORR_DTYPE)
    return mwt, mh


def flow_refine_step_pallas(p1, w2, flow, winsize: int, *,
                            interpret: bool = False):
    """One refinement solve for a batch of fields, channel-planar layout.

    p1/w2: (N, 5, H, W) f32; flow: (N, 2, H, W) f32; returns the updated
    (N, 2, H, W) flow.  Semantics match one iteration of the
    ``ops/flow._flow_level`` body given ``w2`` = frame 2's coefficients
    warped by ``flow`` (tests pin equality against the XLA body).
    """
    n, c, h, w = p1.shape
    assert c == 5 and w2.shape == p1.shape and flow.shape == (n, 2, h, w)
    mwt, mh = _blur_matrices(h, w, winsize)
    return pl.pallas_call(
        _refine_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 5, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, h, w), jnp.float32),
        interpret=interpret,
    )(p1.astype(jnp.float32), w2.astype(jnp.float32),
      flow.astype(jnp.float32), mwt, mh)
