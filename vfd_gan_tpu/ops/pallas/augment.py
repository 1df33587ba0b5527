"""Pallas TPU kernel: fused rotate+crop+flip gather as one-hot MXU matmuls.

The train-time augmentation (ops/augment.py; reference pipeline
lib/data.py:123-135 — Resize -> RandomRotation(10) -> RandomCrop ->
RandomHorizontalFlip) composes into a single nearest-resample affine
gather per clip.  XLA lowers that to a general gather; TPU vector units
have no per-lane gather, so the lowering serialises (~4.3 ms standalone,
~9 ms inside the fused step where it also breaks surrounding fusions).

**Measured experiment — NOT the production path** (BENCH_NOTES.md "Augment
one-hot kernel"): under the corrected scan protocol the XLA uint8 gather
runs 2.13 ms at the reference workload vs 4.18 ms for this kernel — uint8
gathers are ~3x cheaper per position than the f32 flow-warp gathers this
formulation beat, and the S=140 staging pads the matmul K dim to 256.
`ops/augment.py` defaults to the XLA gather; this kernel stays in-tree as
the measured negative result (same status as ops/pallas/spatial_conv.py).

The kernel re-expresses the nearest gather exactly as structured compute,
the same trick as the flow-warp kernel's v3 variant (ops/pallas/warp.py):

* one-hot weights built in closed form ``max(1 - |coord - idx|, 0)`` —
  coords are pre-floored integers, so the peak function degenerates to an
  exact 0/1 one-hot, and any out-of-image coordinate yields an all-zero
  column == the reference's zero fill (PIL rotate fillcolor), with no
  explicit valid mask at all;
* the rotation draw is shared by every frame of the (data, real, mask)
  triple (lib/data.py:63-67), so ONE weight pair per (clip, row-block)
  serves all ``T*C`` planes: each plane runs a ``(S, S) @ (S, M)`` MXU
  matmul (horizontal pick at every candidate source row) followed by a
  vertical one-hot mask-multiply + row reduce at ``(S, M)``.

uint8 pixel values (0..255) and 0/1 one-hot weights are both exact in
bfloat16 and each output receives exactly one non-zero contribution, so
the kernel is bit-exact vs the XLA gather path (tests/test_pallas_augment.py).

Augmentation feeds the training batch before the loss, with no gradient
through the geometry (indices are integer draws), so forward-only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One-hot matmul operand dtype: exact for 0..255 integer pixels (8
# significand bits) and 0/1 weights.
GATHER_DTYPE = jnp.bfloat16


def _augment_kernel(ft_ref, xs_ref, ys_ref, out_ref, *, s: int):
    """One (clip, output-row-block) grid step.

    ft_ref: (1, P, S, S) bf16 planes, P = T*C, values 0..255;
    xs_ref/ys_ref: (1, 1, 1, M) f32 integral source coords for the block's
    M output pixels (un-clamped — out-of-image coords produce an all-zero
    one-hot column, i.e. the zero fill); out_ref: (1, P, M) f32.
    """
    xs = xs_ref[0, 0]                                    # (1, M) f32
    ys = ys_ref[0, 0]
    p = ft_ref.shape[1]
    m = xs.shape[-1]

    # Closed-form one-hot weights, shared by all P planes of the clip:
    # wxt[c, m] = 1 iff source column c == xs[m]; vw[r, m] likewise for rows.
    si = jax.lax.broadcasted_iota(jnp.int32, (s, m), 0).astype(jnp.float32)
    wxt = jnp.maximum(1.0 - jnp.abs(xs - si), 0.0).astype(GATHER_DTYPE)
    vw = jnp.maximum(1.0 - jnp.abs(ys - si), 0.0).astype(GATHER_DTYPE)

    def body(k, carry):
        # (S, S) @ (S, M): horizontal pick at every candidate source row,
        # then a vertical one-hot mask-reduce.  Exactly one non-zero term
        # per output position -> exact in bf16.
        t = jnp.dot(ft_ref[0, k], wxt,
                    preferred_element_type=jnp.float32)  # (S, M)
        out_ref[0, k] = jnp.sum(t.astype(GATHER_DTYPE) * vw, axis=0,
                                dtype=jnp.float32)       # (M,)
        return carry

    jax.lax.fori_loop(0, p, body, 0)


def augment_gather_pallas(frames: jnp.ndarray, src_x: jnp.ndarray,
                          src_y: jnp.ndarray, isize: int, *,
                          interpret: bool = False) -> jnp.ndarray:
    """Nearest-gather ``frames`` at per-clip integral source coords.

    frames: (B, T, S, S, C) uint8/float staged clips; src_x/src_y:
    (B, isize, isize) f32 pre-floored source coordinates (shared across T
    and C, as the reference applies one draw per clip); returns
    (B, T, isize, isize, C) f32 with zero fill outside the image.
    """
    b, t, s, _, c = frames.shape
    # Channel-planar (B, P=T*C, S, S); the bf16 cast runs in XLA where it
    # fuses with the transpose.
    ft = jnp.transpose(frames, (0, 1, 4, 2, 3)).reshape(b, t * c, s, s)
    ft = ft.astype(GATHER_DTYPE)

    bi = next(x for x in (8, 4, 2, 1) if isize % x == 0)
    m = bi * isize
    nb = isize // bi
    xs = src_x.reshape(b, nb, 1, m)
    ys = src_y.reshape(b, nb, 1, m)

    params_cls = getattr(pltpu, "CompilerParams", None) or \
        getattr(pltpu, "TPUCompilerParams")
    compiler_params = params_cls(vmem_limit_bytes=100 * 1024 * 1024)

    out = pl.pallas_call(
        partial(_augment_kernel, s=s),
        grid=(b, nb),
        compiler_params=compiler_params,
        in_specs=[
            # index_map constant in j -> the clip's planes stay resident in
            # VMEM across its nb row blocks (one DMA per clip).
            pl.BlockSpec((1, t * c, s, s), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, m), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, m), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t * c, m), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t * c, isize * isize),
                                       jnp.float32),
        interpret=interpret,
    )(ft, xs, ys)
    out = out.reshape(b, t, c, isize, isize)
    return jnp.transpose(out, (0, 1, 3, 4, 2))
