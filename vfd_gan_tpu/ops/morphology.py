"""On-device morphological opening.

The reference post-processes predicted masks with a CPU cv2 5x5 opening,
round-tripping GPU->CPU->GPU on every train/test step
(reference: lib/utils.py:139-147, call sites models/mygannet.py:289,397 and
lib/train_stcnn.py:112,159).  Here it is a pair of ``lax.reduce_window``
passes (erode = windowed min with +inf padding, dilate = windowed max with
-inf padding), matching cv2's default border semantics where the constant
border never wins the min/max.

Plane quirk (PARITY.md): the reference passes a ``(T, H, W)`` array to
``cv2.morphologyEx``, which cv2 reads as a T-row x H-col image with W
*channels* — so the 5x5 opening actually runs in the **(T, H) plane,
independently per W column**, not per frame.  A lone single-frame blob
survives only if it persists >= k frames.  ``video_open`` replicates this
via ``plane="th"`` (the default, for score parity) and offers the intended
per-frame semantics as ``plane="hw"``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _window_dims(ndim: int, k: int, spatial_axes: tuple[int, int]):
    dims = [1] * ndim
    for ax in spatial_axes:
        dims[ax] = k
    return tuple(dims)


def erode(x: jnp.ndarray, k: int = 5, spatial_axes: tuple[int, int] = (-3, -2)):
    """Windowed min over a ``k x k`` structuring element of ones."""
    axes = tuple(ax % x.ndim for ax in spatial_axes)
    dims = _window_dims(x.ndim, k, axes)
    pad = tuple((k // 2, k // 2) if i in axes else (0, 0) for i in range(x.ndim))
    return lax.reduce_window(x, jnp.inf, lax.min, dims, (1,) * x.ndim, pad)


def dilate(x: jnp.ndarray, k: int = 5, spatial_axes: tuple[int, int] = (-3, -2)):
    """Windowed max over a ``k x k`` structuring element of ones."""
    axes = tuple(ax % x.ndim for ax in spatial_axes)
    dims = _window_dims(x.ndim, k, axes)
    pad = tuple((k // 2, k // 2) if i in axes else (0, 0) for i in range(x.ndim))
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, (1,) * x.ndim, pad)


def _tpu_backend() -> bool:
    backend = jax.default_backend()
    return backend in ("tpu", "axon")


def morphology_open(video: jnp.ndarray, k: int = 5,
                    spatial_axes: tuple[int, int] = (-3, -2),
                    use_pallas: bool | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Opening (erode then dilate) in the plane spanned by ``spatial_axes``.

    ``video`` is channel-last ``(B, T, H, W, C)`` by default (H, W at axes
    -3, -2); works on any layout/plane via ``spatial_axes``.  On TPU
    backends the default path is the fused Pallas kernel
    (:mod:`vfd_gan_tpu.ops.pallas.morphology`), reached by transposing the
    opening plane to the trailing two axes; elsewhere (and under
    ``use_pallas=False``) it is a pair of ``reduce_window`` passes.
    """
    if use_pallas is None:
        use_pallas = _tpu_backend()
    axes = tuple(ax % video.ndim for ax in spatial_axes)
    if use_pallas:
        from vfd_gan_tpu.ops.pallas.morphology import morphology_open_pallas
        perm = tuple(i for i in range(video.ndim) if i not in axes) + axes
        moved = jnp.transpose(video, perm)     # plane to trailing (..., P, Q)
        out = morphology_open_pallas(moved, k=k, interpret=interpret)
        inv = tuple(perm.index(i) for i in range(video.ndim))
        return jnp.transpose(out, inv)
    dtype = video.dtype
    x = video.astype(jnp.float32)
    return dilate(erode(x, k, spatial_axes), k, spatial_axes).astype(dtype)


# Opening planes for channel-last (B, T, H, W, C) mask videos.
# "th": what the reference actually computes — cv2 reads its (T, H, W)
#       input as a (T, H) image with W channels (lib/utils.py:139-147).
# "hw": the intended per-frame opening.
VIDEO_PLANES = {"th": (1, 2), "hw": (2, 3)}


def video_open(video: jnp.ndarray, plane: str = "th", k: int = 5,
               use_pallas: bool | None = None) -> jnp.ndarray:
    """Opening of a channel-last ``(B, T, H, W, C)`` mask video in the
    requested ``plane`` (see module docstring for the "th" quirk)."""
    return morphology_open(video, k, VIDEO_PLANES[plane], use_pallas)
