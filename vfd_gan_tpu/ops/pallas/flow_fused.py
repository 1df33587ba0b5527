"""Pallas TPU kernel: the ENTIRE Farneback refinement loop in one kernel.

``ops/flow._flow_level`` runs, per pyramid level, ``iterations`` (=3)
rounds of {bilinear-warp the 5 polynomial-coefficient planes by the
current flow, box-blur the 2x2 normal-equation quantities, closed-form
solve} (reference hot spot: the cv2 Farneback call, lib/utils.py:94-129).
The round-2/5 TPU path dispatches TWO Pallas kernels per iteration
(ops/pallas/warp.py + ops/pallas/flow_refine.py) with the warped planes
and updated flow round-tripping through HBM between them — 6 dispatches
and ~2 MB of HBM traffic per field per level, plus the XLA glue at every
kernel boundary (the per-iteration interaction cost the round-2 A/B
measured as an exact tie, BENCH_NOTES.md).

This kernel fuses the whole loop: ONE grid step = one field's complete
``iterations``-round refinement with every intermediate VMEM-resident —
p1/p2 coefficient planes, the warped planes (a VMEM scratch), the flow
carry (the output ref itself), and the blur matrices all stay on-chip;
HBM sees only the initial operand streams and the final flow.

Formulation per iteration (identical math to the two-kernel path):

* **warp** — the v5-banded one-hot-matmul scheme (ops/pallas/warp.py)
  restructured for an in-kernel flow carry: a ``fori_loop`` over 8-row
  blocks extracts each coordinate row as an offset-0 ``(1, W)`` vector
  via a mask-reduce (Mosaic cannot relayout sublane-/lane-offset pieces
  across concats, so the wrapper-side ``(1, 8W)`` pixel-major layout is
  unavailable in-kernel), builds the closed-form ``relu(1 - |c - i|)``
  weight arrays per row, and runs the 5 planes through
  ``(band, W) @ (W, W)`` MXU matmuls + a bf16 vertical mask-reduce —
  identical MAC count to the wrapper's ``(band, W) @ (W, 8W)`` form,
  just narrower matmuls.  The vertical candidate band start is
  ``(8*jb - ceil(max_dy)) // 16 * 16`` — *derived from the block
  index*, so banding is deterministic by construction (coverage:
  ``band >= 7 + 2*max_dy + 2 + 15``); flow_y is clamped to ``+-max_dy``
  exactly like the production v5 wrapper (PARITY.md "TPU warp band
  clamp").
* **solve** — the whole-plane algebra + bf16-operand/f32-accumulate
  box-blur matmuls + 2x2 solve of ops/pallas/flow_refine.py, reading the
  VMEM scratch and writing the flow carry in place.

``interpret=True`` runs the kernel in interpreter mode so CPU tests can
pin equality against the XLA body (tests/test_pallas_flow_fused.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vfd_gan_tpu.ops.pallas.flow_refine import _blur_matrices
from vfd_gan_tpu.ops.pallas.warp import WARP_DTYPE

# band rows + vertical displacement clamp by plane height — the same
# envelope as ops/pallas/warp._V5_BANDS (there: data-dependent band start
# with 15 rows of rounding slack below; here the start is index-derived,
# needing band >= 7 + 2*max_dy + 17).
_BANDS = {128: (48, 11.0), 64: (32, 3.0)}

_ROWS_PER_BLOCK = 8


def _fused_kernel(p1_ref, p2_ref, flow_ref, mwt_ref, mh_ref, out_ref,
                  w2_ref, *, h: int, w: int, iters: int, band: int,
                  max_dy: float | None):
    """One field's complete refinement: p1_ref (1, 5, H, W) f32,
    p2_ref (1, 5, H, W) bf16, flow_ref/out_ref (1, 2, H, W) f32,
    mwt/mh the (W, W)/(H, H) bf16 box-blur matrices, w2_ref a
    (5, H, W) f32 VMEM scratch for the warped planes."""
    rb = _ROWS_PER_BLOCK
    out_ref[0, 0] = flow_ref[0, 0]
    out_ref[0, 1] = flow_ref[0, 1]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32)
    si = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0).astype(jnp.float32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (band, w), 0).astype(jnp.float32)
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 0)
    dy_int = 0 if max_dy is None else int(math.ceil(max_dy))

    b1x, b1y = p1_ref[0, 0], p1_ref[0, 1]
    a1xx, a1yy, a1xy = p1_ref[0, 2], p1_ref[0, 3], p1_ref[0, 4]
    mwt = mwt_ref[...]
    mh = mh_ref[...]

    def blur(q):
        t = jnp.dot(q.astype(mwt.dtype), mwt,
                    preferred_element_type=jnp.float32)
        return jnp.dot(mh, t.astype(mh.dtype),
                       preferred_element_type=jnp.float32)

    for _ in range(iters):
        # ---- warp p2 by the current flow carry into the VMEM scratch ----
        def block_body(jb, _):
            r0 = pl.multiple_of(jb * rb, rb)
            fxb = out_ref[0, 0, pl.ds(r0, rb), :]           # (rb, W)
            fyb = out_ref[0, 1, pl.ds(r0, rb), :]
            r0f = r0.astype(jnp.float32)
            if max_dy is None:
                start = 0
            else:
                start = jnp.clip(((r0 - dy_int) // 16) * 16, 0, h - band)
                start = pl.multiple_of(start, 16)
            sf = jnp.float32(0.0) if max_dy is None \
                else start.astype(jnp.float32)

            p2b = [p2_ref[0, ci, pl.ds(start, band), :]
                   if max_dy is not None else p2_ref[0, ci]
                   for ci in range(5)]                      # (band, W) bf16

            def pick(v, i):
                # row i of a (rb, W) value as an offset-0 (1, W) vector —
                # mask-reduce instead of a sublane slice (Mosaic cannot
                # relayout sublane-offset pieces across a concat)
                return jnp.sum(jnp.where(rows8 == i, v, 0.0), axis=0,
                               keepdims=True, dtype=jnp.float32)

            res_rows = [[] for _ in range(5)]
            for i in range(rb):
                rf = r0f + jnp.float32(i)
                xs = jnp.clip(col + pick(fxb, i), 0.0, w - 1.0)    # (1, W)
                ys = jnp.clip(rf + pick(fyb, i), 0.0, h - 1.0)
                if max_dy is not None:
                    ys = jnp.clip(ys, rf - max_dy, rf + max_dy)
                ysb = jnp.clip(ys - sf, 0.0, band - 1.0)
                # closed-form two-hot weights (ops/pallas/warp.py v3/v5)
                wxt = jnp.maximum(1.0 - jnp.abs(xs - si),
                                  0.0).astype(WARP_DTYPE)  # (W, W)
                vw = jnp.maximum(1.0 - jnp.abs(ysb - ri),
                                 0.0).astype(WARP_DTYPE)   # (band, W)
                for ci in range(5):
                    t = jnp.dot(p2b[ci], wxt,
                                preferred_element_type=jnp.float32)
                    res_rows[ci].append(jnp.sum(
                        t.astype(WARP_DTYPE) * vw, axis=0, keepdims=True,
                        dtype=jnp.float32))                 # (1, W)
            for ci in range(5):
                # offset-0 rows concatenated on the sublane axis -> one
                # aligned (rb, W) block store
                w2_ref[ci, pl.ds(r0, rb), :] = jnp.concatenate(
                    res_rows[ci], axis=0)
            return 0

        jax.lax.fori_loop(0, h // rb, block_body, 0)

        # ---- refinement solve (ops/pallas/flow_refine.py body) ----
        fx, fy = out_ref[0, 0], out_ref[0, 1]
        w2bx, w2by = w2_ref[0], w2_ref[1]
        w2xx, w2yy, w2xy = w2_ref[2], w2_ref[3], w2_ref[4]

        axx = (a1xx + w2xx) * 0.5
        ayy = (a1yy + w2yy) * 0.5
        axy = ((a1xy + w2xy) * 0.5) * 0.5
        dbx = -0.5 * (w2bx - b1x) + axx * fx + axy * fy
        dby = -0.5 * (w2by - b1y) + axy * fx + ayy * fy

        g11 = blur(axx * axx + axy * axy)
        g12 = blur(axy * (axx + ayy))
        g22 = blur(ayy * ayy + axy * axy)
        h1 = blur(axx * dbx + axy * dby)
        h2 = blur(axy * dbx + ayy * dby)

        det = g11 * g22 - g12 * g12
        det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
        out_ref[0, 0] = (g22 * h1 - g12 * h2) / det
        out_ref[0, 1] = (g11 * h2 - g12 * h1) / det


def flow_refine_fused_pallas(p1, p2, flow, winsize: int, iterations: int,
                             *, interpret: bool = False):
    """Full multi-iteration refinement for a batch of fields.

    p1/p2: (N, 5, H, W) frame-1 / frame-2 polynomial coefficient planes
    (p2 is cast to bf16 for the warp matmuls, the production warp
    contract); flow: (N, 2, H, W) f32.  Returns the refined (N, 2, H, W)
    flow.  Semantics: ``iterations`` rounds of the ops/flow._flow_level
    body, with flow_y clamped to the per-height ``_BANDS`` envelope on
    128/64-row planes (exactly the production v5 warp clamp)."""
    n, c, h, w = p1.shape
    assert c == 5 and flow.shape == (n, 2, h, w)
    assert h % _ROWS_PER_BLOCK == 0
    band, max_dy = _BANDS.get(h, (h, None))
    mwt, mh = _blur_matrices(h, w, winsize)

    params_cls = getattr(pltpu, "CompilerParams", None) or \
        getattr(pltpu, "TPUCompilerParams")
    compiler_params = params_cls(vmem_limit_bytes=100 * 1024 * 1024)

    return pl.pallas_call(
        partial(_fused_kernel, h=h, w=w, iters=iterations, band=band,
                max_dy=max_dy),
        grid=(n,),
        compiler_params=compiler_params,
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
        scratch_shapes=[pltpu.VMEM((5, h, w), jnp.float32)],
        interpret=interpret,
    )(p1.astype(jnp.float32), p2.astype(WARP_DTYPE),
      flow.astype(jnp.float32), mwt, mh)
