"""Pallas TPU kernel: 3x3 stride-1 SAME spatial conv as 9 MXU dots.

HISTORICAL NOTE (round 3): the "~5x emitter gap" that motivated this
kernel was a measurement artifact — the round-2 protocol carried a
~27 ms per-call tunnel overhead and a partial-output reduction that let
XLA dead-code-eliminate most of the conv under test.  Corrected numbers
(BENCH_NOTES.md "Round 3: measurement recalibration") put XLA's emitter
at 48-79%% of v5e bf16 peak on every model shape, and this kernel ties
it at best.  It stays in-tree as a measured experiment and as the
repo's reference for a Mosaic direct conv.  (Reference conv blocks:
models/mygannet.py:13-28, 104-116.)  This kernel lowers the conv
directly: for each of the 9 taps, one ``(H*W, Cin) @ (Cin, Cout)``
MXU dot accumulated in f32.

Mosaic-friendly construction:

* W-axis tap shifts are NOT sliced in-kernel (unaligned sublane slices
  relayout); instead XLA prepares three W-shifted views of the padded
  input, and the kernel only slices the H axis — a *major* dim, which is
  free address arithmetic.
* ``(H, W, C) -> (H*W, C)`` merges two non-lane dims (legal; W must be a
  multiple of 8 — all model resolutions are).
* Weights and bias live whole in VMEM (<= 9*512*512*2B = 4.5 MB worst
  case); the f32 accumulator is the only scratch.

The backward pass is two more of the same shape: d_input is a 3x3 conv of
dy with the spatially-flipped, in/out-transposed kernel (same Pallas
kernel), and d_weights is 9 big-K GEMMs done as one XLA einsum (XLA is
already optimal for reduce-to-small matmuls).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x0_ref, x1_ref, x2_ref, w_ref, out_ref, acc_ref, *,
                 h: int, w: int):
    """One image per grid step.  x*_ref: (1, H+2, W, C) — the three
    W-shifted views of the zero-padded frame; w_ref: (3, 3, C, Cout);
    out_ref: (1, H*W, Cout); acc_ref: f32 scratch (H*W, Cout)."""
    views = (x0_ref, x1_ref, x2_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dh in range(3):
        for dw in range(3):
            a = views[dw][0, dh:dh + h]           # (H, W, C) major-dim slice
            a = a.reshape(h * w, a.shape[-1])
            acc_ref[...] += jnp.dot(a, w_ref[dh, dw],
                                    preferred_element_type=jnp.float32)
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _conv_fwd_pallas(xp_views, weights, *, h: int, w: int,
                     interpret: bool = False) -> jnp.ndarray:
    """xp_views: 3 arrays (N, H+2, W, C); weights (3, 3, C, Cout)."""
    n = xp_views[0].shape[0]
    c = xp_views[0].shape[-1]
    cout = weights.shape[-1]
    params_cls = getattr(pltpu, "CompilerParams", None) or \
        getattr(pltpu, "TPUCompilerParams")
    return pl.pallas_call(
        partial(_conv_kernel, h=h, w=w),
        grid=(n,),
        compiler_params=params_cls(vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[pl.BlockSpec((1, h + 2, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] * 3 +
                 [pl.BlockSpec((3, 3, c, cout), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h * w, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h * w, cout), xp_views[0].dtype),
        scratch_shapes=[pltpu.VMEM((h * w, cout), jnp.float32)],
        interpret=interpret,
    )(*xp_views, weights)


def _views(x4: jnp.ndarray) -> list[jnp.ndarray]:
    """Zero-pad (N, H, W, C) by 1 and take the three W-shifted views."""
    xp = jnp.pad(x4, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wdim = x4.shape[2]
    return [xp[:, :, dw:dw + wdim] for dw in range(3)]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_pallas(x4: jnp.ndarray, weights: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """3x3 stride-1 SAME conv: x4 (N, H, W, Cin), weights (3,3,Cin,Cout).

    Matches ``lax.conv_general_dilated(..., NHWC/HWIO, SAME)`` numerically
    (f32 accumulation) — pinned by tests/test_pallas_spatial_conv.py.
    """
    n, h, w, c = x4.shape
    y = _conv_fwd_pallas(_views(x4), weights.astype(x4.dtype), h=h, w=w,
                         interpret=interpret)
    return y.reshape(n, h, w, weights.shape[-1])


def _fwd(x4, weights, interpret):
    return conv3x3_pallas(x4, weights, interpret), (x4, weights)


def _bwd(interpret, res, dy):
    x4, weights = res
    n, h, w, c = x4.shape
    dy = dy.astype(x4.dtype)
    # d_input: SAME conv of dy with the flipped, (Cin<->Cout)-transposed
    # kernel — identical kernel structure, so reuse the Pallas path.
    wt = jnp.flip(weights, axis=(0, 1)).swapaxes(2, 3).astype(x4.dtype)
    dx = _conv_fwd_pallas(_views(dy), wt, h=h, w=w,
                          interpret=interpret).reshape(n, h, w, c)
    # d_weights[dh, dw] = sum_pixels x_shifted^T dy: reduce-to-small GEMMs,
    # where XLA's emitter is already at roofline — keep it in XLA.
    xp = jnp.pad(x4, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = jnp.stack([xp[:, dh:dh + h, dw:dw + w]
                      for dh in range(3) for dw in range(3)])
    dw_ = jnp.einsum("knhwc,nhwd->kcd", taps, dy,
                     preferred_element_type=jnp.float32)
    return dx, dw_.reshape(3, 3, c, -1).astype(weights.dtype)


conv3x3_pallas.defvjp(_fwd, _bwd)
