"""Pallas TPU kernel: bilinear flow warp as MXU one-hot matmul + select tree.

The Farneback refinement loop warps the 5 stacked polynomial-coefficient
maps by the current flow every iteration (reference hot spot: the cv2 flow
call, lib/utils.py:94-129; on-device rebuild ops/flow.py:_bilinear_warp).
XLA lowers that to a general gather whose measured cost is ~60 ms per 2M
positions on a v5e — the single largest slice of the fused train step
(BENCH_NOTES.md component budget).

TPU vector units have no per-lane gather, so this kernel re-expresses the
2-D bilinear sample exactly as structured compute.  Production variant
("v3", `_warp_kernel_v3`):

* both bilinear weight arrays are built ONCE per row-block in closed form
  ``relu(1 - |coord - idx|)`` — horizontal ``(W, M=BI*W)``, vertical
  ``(H, M)`` — 4 VPU ops per element and no integer floor/compare chains;
* each of the C field planes runs a ``(H, W) @ (W, M)`` MXU matmul
  (horizontal interpolation at every candidate source row) followed by a
  vertical mask-multiply + row reduce at ``(H, M)``.

The superseded "v2" kernel (kept for bench comparisons,
tools/bench_warp.py) did the horizontal matmul at the channel-interleaved
``(H*C, W)`` layout and built its vertical two-hot weights at
``(H*C, M)`` with compare/select chains — that weight build was the
dominant non-MXU cost (device profile: 13.4 ms/step at 128^2 vs a ~5 ms
MXU bound); v3 measured 1.7-2.0x faster at every pyramid level and
bit-identical on device (BENCH_NOTES.md round 3).  Earlier still: a
log2(H) select-tree vertical pass, 1.2-1.3x slower than v2.

Mosaic constraints honoured throughout: no 1-D vectors, no reshapes that
merge/split the minor (lane) dim, no minor-dim broadcasts.  All per-pixel
quantities live as ``(1, BI*W)`` rows; the field/coordinate layouts are
prepared outside the kernel where XLA transposes are free to fuse.

Flow values feed the (fully detached) discriminator inputs, so the warp is
forward-only: no custom VJP is needed (gan_engine.py stop-gradient wiring,
reference models/mygannet.py:279-286).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One-hot matmul operand dtype.  bf16 weights quantise the fractional
# bilinear weights to ~3 decimal digits — well inside the flow pipeline's
# documented cv2 tolerance (see ops/flow.py CORR_DTYPE, same trade).
WARP_DTYPE = jnp.bfloat16


def _warp_kernel(ft_ref, xs_ref, ys_ref, out_ref, *, h: int, c: int):
    """One (image, row-block) grid step.

    ft_ref: (1, H*C, W) field with rows (source row, channel); xs/ys_ref:
    (1, M=BI*W) absolute sample coordinates (pre-clamped, pixel-major);
    out_ref: (1, C, M).
    """
    _, _, w = ft_ref.shape
    xs = xs_ref[0, 0]                                    # (1, M) f32
    ys = ys_ref[0, 0]
    x0f = jnp.floor(xs)
    wx = xs - x0f
    x0 = x0f.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y0f = jnp.floor(ys)
    wy = ys - y0f
    y0 = y0f.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)

    # Two-hot horizontal weights: wxt[s, m] weights source column s for
    # output pixel m (x0 == x1 at the right border degrades to the sum of
    # both hots = the clamped sample, matching the XLA path).
    s = jax.lax.broadcasted_iota(jnp.int32, (w,) + xs.shape[1:], 0)
    zero = jnp.zeros((), jnp.float32)
    wxt = (jnp.where(s == x0, 1.0 - wx, zero)
           + jnp.where(s == x1, wx, zero)).astype(WARP_DTYPE)

    # (H*C, W) @ (W, M): every channel's horizontally-interpolated value at
    # every candidate source row, in one MXU pass per row-block.  The
    # vertical pass runs on bf16 (one extra f32->bf16 rounding, ~1e-2 abs
    # on O(1) poly coefficients — inside the flow pipeline's cv2 tolerance).
    t = jnp.dot(ft_ref[0].astype(WARP_DTYPE), wxt,
                preferred_element_type=jnp.float32)      # (H*C, M)
    m = t.shape[-1]
    t = t.astype(WARP_DTYPE)

    # Vertical two-hot mask-reduce, still in (H*C, M) layout: weight row
    # (r, ci) by (1-wy) where r==y0 and wy where r==y1 (y0 == y1 at the
    # bottom border degrades to their sum = the clamped sample, matching
    # the XLA path), then contract the rows back to channels with a tiny
    # constant 0/1 matmul on the MXU — no vector reductions, no slicing.
    # (building this at (H, M) + a middle-axis broadcast_to measured SLOWER
    # — Mosaic materialises the replication as a real copy)
    ri = jax.lax.broadcasted_iota(
        jnp.int32, (h, c, m), 0).reshape(h * c, m)       # source row id
    wv = (jnp.where(ri == y0, 1.0 - wy, zero)
          + jnp.where(ri == y1, wy, zero)).astype(WARP_DTYPE)
    # chan_pick[ci, (r, cj)] = 1 iff cj == ci  (cj = column index mod c;
    # built with iota arithmetic — reshapes must not touch the lane dim)
    rc = jax.lax.broadcasted_iota(jnp.int32, (c, h * c), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, h * c), 0)
    chan_pick = (rc - (rc // c) * c == ci).astype(WARP_DTYPE)
    out_ref[0] = jnp.dot(chan_pick, t * wv,
                         preferred_element_type=jnp.float32)  # (C, M)


def _warp_kernel_v3(ft_ref, xs_ref, ys_ref, out_ref, *, h: int, c: int):
    """One (image, row-block) grid step, channel-planar formulation.

    ft_ref: (1, C, H, W) bf16 field planes; xs/ys_ref: (1, 1, 1, M=BI*W)
    absolute sample coordinates (pre-clamped); out_ref: (1, C, M) f32.

    v2 built the vertical two-hot weights at the channel-interleaved
    ``(H*C, M)`` — ~6 VPU ops per element of a 640x1024 array per block,
    the dominant non-MXU cost (device profile: 13.4 ms/step at 128^2 vs a
    ~5 ms MXU bound).  v3 builds both weight arrays ONCE at ``(W, M)`` /
    ``(H, M)`` as the closed form ``relu(1 - |coord - idx|)`` (equal to
    the two-hot: 1-frac at floor, frac at floor+1, and the clamped-border
    sum-of-hots degeneracy falls out of |coord - idx| = 0), then loops
    the C=5 field planes through a (H, W) @ (W, M) MXU matmul and a
    vertical mask-reduce at (H, M).
    """
    xs = xs_ref[0, 0]                                    # (1, M) f32
    ys = ys_ref[0, 0]
    _, _, _, w = ft_ref.shape
    m = xs.shape[-1]

    # Horizontal weights (W, M): wxt[s, m] = relu(1 - |xs[m] - s|).
    si = jax.lax.broadcasted_iota(jnp.int32, (w, m), 0).astype(jnp.float32)
    wxt = jnp.maximum(1.0 - jnp.abs(xs - si), 0.0).astype(WARP_DTYPE)
    # Vertical weights (H, M): vw[r, m] = relu(1 - |ys[m] - r|).
    ri = jax.lax.broadcasted_iota(jnp.int32, (h, m), 0).astype(jnp.float32)
    vw = jnp.maximum(1.0 - jnp.abs(ys - ri), 0.0).astype(WARP_DTYPE)

    for ci in range(c):
        # (H, W) @ (W, M): horizontally-interpolated plane at every
        # candidate source row.  The vertical blend runs in bf16 (at most
        # two non-zero weight rows per column, so accumulation order is
        # immaterial); one extra bf16 rounding vs f32, inside the flow
        # pipeline's documented cv2 tolerance.
        t = jnp.dot(ft_ref[0, ci], wxt,
                    preferred_element_type=jnp.float32)  # (H, M) f32
        out_ref[0, ci] = jnp.sum(t.astype(WARP_DTYPE) * vw, axis=0,
                                 dtype=jnp.float32)      # (M,) f32


def _warp_kernel_v4(ft_ref, xs_ref, ys_ref, out_ref, *, h: int, c: int):
    """v3 with the channel loop folded into the MXU.

    ft_ref: (1, C, H, W) bf16 planes; xs/ys_ref: (1, 1, 1, M); out (1, C, M).

    **Measured SLOWER than v3 at every pyramid level** (N=120 scan
    protocol: 128^2 2.71 vs 2.43 ms, 64^2 0.65 vs 0.57, 32^2 0.27 vs
    0.21) — the (C*H, M) masked re-stack is a real VMEM copy and the
    chan_pick matmul adds MXU work without removing the per-column
    multiplies.  Kept for bench comparisons only (tools/bench_warp.py).

    Differences vs v3 (same closed-form weights):
    * ONE ``(C*H, W) @ (W, M)`` horizontal matmul instead of C small ones
      (the plane stack reshapes only leading dims — lane layout untouched);
    * the vertical reduce runs on the MXU: per-channel ``t ⊙ vw`` slices
      re-stacked and contracted with a constant 0/1 channel-pick matrix,
      replacing C sublane f32 row-reduces with one tiny matmul.
    """
    xs = xs_ref[0, 0]                                    # (1, M) f32
    ys = ys_ref[0, 0]
    _, _, _, w = ft_ref.shape
    m = xs.shape[-1]

    si = jax.lax.broadcasted_iota(jnp.int32, (w, m), 0).astype(jnp.float32)
    wxt = jnp.maximum(1.0 - jnp.abs(xs - si), 0.0).astype(WARP_DTYPE)
    ri = jax.lax.broadcasted_iota(jnp.int32, (h, m), 0).astype(jnp.float32)
    vw = jnp.maximum(1.0 - jnp.abs(ys - ri), 0.0).astype(WARP_DTYPE)

    t = jnp.dot(ft_ref[0].reshape(c * h, w), wxt,
                preferred_element_type=jnp.float32)      # (C*H, M)
    t = t.astype(WARP_DTYPE)
    masked = jnp.concatenate(
        [t[ci * h:(ci + 1) * h] * vw for ci in range(c)], axis=0)
    # chan_pick[ci, r] = 1 iff r // h == ci: contract rows -> channels on
    # the MXU (FLOPs are trivial; replaces C vector row-reduces).
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, c * h), 1)
    cis = jax.lax.broadcasted_iota(jnp.int32, (c, c * h), 0)
    chan_pick = (rows // h == cis).astype(WARP_DTYPE)
    out_ref[0] = jnp.dot(chan_pick, masked,
                         preferred_element_type=jnp.float32)  # (C, M)


def _warp_kernel_v5(ft_ref, xs_ref, ys_ref, out_ref, *, h: int, c: int,
                    band: int):
    """v3 with the vertical candidate rows cut to a dynamic band.

    Every output pixel's bilinear sample touches exactly two source rows,
    and one row-block's sample rows ``ys`` cluster around the block itself
    (smooth flow fields): v3 still pays all H candidate rows in the
    horizontal matmul and the vertical weight build.  v5 computes the
    block's band start ``floor(min ys)`` (rounded down to the bf16 sublane
    tile, clamped into the plane) and runs both stages on ``band`` rows
    sliced at that dynamic offset — an H/band FLOP/VPU cut at identical
    output (zero weight rows contribute exactly nothing, and the two
    non-zero vertical terms are summed in the same f32 precision).

    Envelope: a block is exact while ``max(ys) - min(ys) <= band - 18``
    (15 rows of tile-rounding slack below + the two-row bilinear footprint
    above).  The wrapper guarantees this by clamping the vertical
    displacement to the per-height bound in ``_V5_BANDS`` — v5 is exactly
    "bilinear warp with |flow_y| <= D", deterministic and block-layout
    independent; tests/test_pallas_warp.py pins both the in-envelope
    exactness and the clamped-large-flow semantics.
    """
    xs = xs_ref[0, 0]                                    # (1, M) f32
    ys = ys_ref[0, 0]
    _, _, _, w = ft_ref.shape
    m = xs.shape[-1]

    lo = jnp.floor(jnp.min(ys)).astype(jnp.int32)
    start = jnp.clip((lo // 16) * 16, 0, h - band)
    start = pl.multiple_of(start, 16)
    ysb = jnp.clip(ys - start.astype(jnp.float32), 0.0, band - 1.0)

    si = jax.lax.broadcasted_iota(jnp.int32, (w, m), 0).astype(jnp.float32)
    wxt = jnp.maximum(1.0 - jnp.abs(xs - si), 0.0).astype(WARP_DTYPE)
    ri = jax.lax.broadcasted_iota(jnp.int32, (band, m), 0).astype(jnp.float32)
    vw = jnp.maximum(1.0 - jnp.abs(ysb - ri), 0.0).astype(WARP_DTYPE)

    for ci in range(c):
        t = jnp.dot(ft_ref[0, ci, pl.ds(start, band), :], wxt,
                    preferred_element_type=jnp.float32)  # (band, M) f32
        out_ref[0, ci] = jnp.sum(t.astype(WARP_DTYPE) * vw, axis=0,
                                 dtype=jnp.float32)      # (M,) f32


# Band sizes by plane height, and the vertical-displacement bound the
# wrapper clamps flow_y to so v5's semantics are DETERMINISTIC: with
# |flow_y| <= D every 8-row block's sample span is 7 + 2D <= band - 18,
# guaranteeing exactness.  Without the clamp an out-of-envelope block
# would silently snap samples to its band edge depending on which other
# pixels share the block.  v5 is therefore exactly "bilinear warp with
# vertical displacement clamped to +-D" — a documented approximation
# (Farneback refinement flows are winsize-15 box-blurred and far smaller
# in practice; PARITY.md "TPU warp band clamp").  v5 is the TPU production
# default since the round-5 e2e A/B (41.1 -> 42.2 clips/s, BENCH_NOTES.md);
# VFD_WARP_VARIANT=v3 restores the unclamped kernel.
_V5_BANDS = {128: (48, 11.0), 64: (32, 3.0)}


def bilinear_warp_pallas(fields: jnp.ndarray, flow_x: jnp.ndarray,
                         flow_y: jnp.ndarray, *,
                         interpret: bool = False,
                         variant: str = "v3",
                         channel_planar: bool = False) -> jnp.ndarray:
    """Drop-in for ops/flow._bilinear_warp on TPU backends.

    fields (N, H, W, C) float; flow_x/flow_y (N, H, W) displacements added
    to the pixel grid and clamped to the image bounds (cv2 convention).
    ``variant`` selects the kernel formulation ("v3" default; "v2" kept
    for bench comparisons, tools/bench_warp.py).  ``channel_planar=True``
    returns ``(N, C, H, W)`` — the kernel's native layout — skipping the
    channel-last transpose (the fused-refinement path consumes planes,
    ops/pallas/flow_refine.py).
    """
    n, h, w, c = fields.shape
    ys = jnp.clip(jnp.arange(h, dtype=jnp.float32)[None, :, None] + flow_y,
                  0.0, h - 1.0).reshape(n, h * w)
    xs = jnp.clip(jnp.arange(w, dtype=jnp.float32)[None, None, :] + flow_x,
                  0.0, w - 1.0).reshape(n, h * w)

    bi = next(b for b in (8, 4, 2, 1) if h % b == 0)
    m = bi * w
    nb = h // bi
    # (n, nb, 1, m) so the block's last two dims (1, m) equal array dims
    # (Pallas requires the trailing two block dims divide (8, 128) or match)
    xs = xs.reshape(n, nb, 1, m)
    ys = ys.reshape(n, nb, 1, m)

    # The kernel's working set exceeds the default 16M scoped-vmem budget
    # at 128x128; the chip has far more VMEM than the default cap.
    params_cls = getattr(pltpu, "CompilerParams", None) or \
        getattr(pltpu, "TPUCompilerParams")
    compiler_params = params_cls(vmem_limit_bytes=100 * 1024 * 1024)

    if variant == "v5" and h not in _V5_BANDS:
        variant = "v3"                     # small planes: banding is a no-op
    if variant in ("v3", "v4", "v5"):
        # channel-planar layout; the f32->bf16 cast runs in XLA where it
        # fuses with the transpose (and halves the field DMA).
        if variant == "v5":
            band, max_dy = _V5_BANDS[h]
            kern = partial(_warp_kernel_v5, band=band)
            # deterministic envelope (see _V5_BANDS): ys was grid + flow_y
            # clamped to the image; re-clamp it to grid +- max_dy
            grid = jnp.broadcast_to(
                jnp.arange(h, dtype=jnp.float32)[:, None], (h, w)
            ).reshape(1, h * w).reshape(1, nb, 1, m)
            ys = jnp.clip(ys, grid - max_dy, grid + max_dy)
        else:
            kern = _warp_kernel_v3 if variant == "v3" else _warp_kernel_v4
        ft = jnp.transpose(fields, (0, 3, 1, 2)).astype(WARP_DTYPE)
        out = pl.pallas_call(
            partial(kern, h=h, c=c),
            grid=(n, nb),
            compiler_params=compiler_params,
            in_specs=[
                pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, m), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, m), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, c, m), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, c, h * w), jnp.float32),
            interpret=interpret,
        )(ft, xs, ys)
        out = out.reshape(n, c, h, w)
        return out if channel_planar else jnp.transpose(out, (0, 2, 3, 1))

    # rows = (source row, channel) so one matmul covers all channels
    ft = jnp.transpose(fields.astype(jnp.float32),
                       (0, 1, 3, 2)).reshape(n, h * c, w)
    out = pl.pallas_call(
        partial(_warp_kernel, h=h, c=c),
        grid=(n, nb),
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((1, h * c, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, m), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, m), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, m), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, h * w), jnp.float32),
        interpret=interpret,
    )(ft, xs, ys)
    # (N, C, H*W) -> (N, H, W, C); XLA fuses this into the consumers
    out = out.reshape(n, c, h, w)
    return out if channel_planar else jnp.transpose(out, (0, 2, 3, 1))
