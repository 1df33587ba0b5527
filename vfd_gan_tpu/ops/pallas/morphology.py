"""Pallas TPU kernel: fused morphological opening (erode -> dilate).

The lax.reduce_window implementation runs one windowed reduce per stage on a
channels=1 video — poor lane utilisation and two HBM round trips.  This
kernel performs the whole opening for one frame per grid step inside VMEM:
separable 1x5/5x1 min passes (erode, +inf border) immediately followed by
the matching max passes (dilate, -inf border), one HBM read and one write
per frame.

Used for the reference's 5x5 post-processing open (lib/utils.py:139-147)
via :func:`vfd_gan_tpu.ops.morphology.morphology_open` on TPU backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _open_kernel(x_ref, out_ref, pad_ref, col_ref, *, k: int):
    _, h, w = x_ref.shape
    r = k // 2
    big = jnp.inf

    def separable(src, combine, border):
        # row pass: (H, W+2r) scratch
        pad_ref[:, :] = jnp.full(pad_ref.shape, border, jnp.float32)
        pad_ref[:h, r:w + r] = src
        rowred = pad_ref[:h, 0:w]
        for dx in range(1, k):
            rowred = combine(rowred, pad_ref[:h, dx:dx + w])
        # column pass: (H+2r, W) scratch
        col_ref[:, :] = jnp.full(col_ref.shape, border, jnp.float32)
        col_ref[r:h + r, :w] = rowred
        out = col_ref[0:h, :w]
        for dy in range(1, k):
            out = combine(out, col_ref[dy:dy + h, :w])
        return out

    eroded = separable(x_ref[0], jnp.minimum, big)
    out_ref[0] = separable(eroded, jnp.maximum, -big)


def morphology_open_pallas(video: jnp.ndarray, k: int = 5,
                           interpret: bool = False) -> jnp.ndarray:
    """Opening over the trailing (H, W) axes of ``(..., H, W)`` float input.

    Channel-last videos ``(B, T, H, W, 1)`` should be squeezed/moved so H, W
    are trailing; :func:`vfd_gan_tpu.ops.morphology.morphology_open` handles
    the layout."""
    shape = video.shape
    h, w = shape[-2], shape[-1]
    n = 1
    for d in shape[:-2]:
        n *= d
    x = video.reshape(n, h, w).astype(jnp.float32)
    r = k // 2

    out = pl.pallas_call(
        partial(_open_kernel, k=k),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((h, w + 2 * r), jnp.float32),
            pltpu.VMEM((h + 2 * r, w), jnp.float32),
        ],
        interpret=interpret,
    )(x)
    return out.reshape(shape).astype(video.dtype)
