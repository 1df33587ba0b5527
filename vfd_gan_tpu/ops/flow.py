"""On-device dense optical flow (Farneback-equivalent) + HSV flow encoding.

The reference computes Farneback flow with cv2 **on the CPU inside every
train and test step** for both the ground-truth and predicted mask videos
(lib/utils.py:94-129; call sites models/mygannet.py:281-282,404-405) — the
single biggest non-accelerator cost in the pipeline (SURVEY.md §6).  This
module is the TPU-native replacement: the same algorithm family
(polynomial-expansion flow: Farneback 2003), with cv2's default parameters
(pyr_scale=.5, levels=3, winsize=15, iterations=3, poly_n=5,
poly_sigma=1.2, box-blur aggregation), written as separable correlations,
elementwise algebra and closed-form 2x2 solves — everything batches, jits
and fuses.

Exact bit parity with OpenCV is not claimed (documented tolerance;
SURVEY.md §7 "hard parts"); tests verify known-translation recovery and
directional agreement with cv2.  A host-cv2 escape hatch lives in
``vfd_gan_tpu/train/host_flow.py`` for parity audits.

Also reproduces the reference's flow-video framing quirks
(lib/utils.py:104-129): frame ``j`` holds flow(j, j+1); the final flow frame
is duplicated so the clip keeps T frames; per-frame HSV encoding uses
hue = angle_deg/2, full saturation, value = min-max-normalised magnitude;
output is RGB scaled to [-1, 1].
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from vfd_gan_tpu.ops.image import minmax_normalize
from vfd_gan_tpu.ops.resize import resize_bilinear


# --------------------------------------------------------------------------
# Polynomial expansion
# --------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _poly_kernels(n: int, sigma: float):
    """1-D gaussian moment kernels (w, w*x, w*x^2) over [-n, n] and the
    inverse Gram matrix of the quadratic basis {1, x, y, x^2, y^2, xy}."""
    x = np.arange(-n, n + 1, dtype=np.float64)
    w = np.exp(-(x ** 2) / (2 * sigma ** 2))
    w /= w.sum()
    k0, k1, k2 = w, w * x, w * x * x

    # Gram matrix G_ij = sum_xy w(x)w(y) phi_i phi_j for the separable basis.
    def m(p):  # 1-D moment sum w * x^p
        return float((w * x ** p).sum())

    g = np.zeros((6, 6))
    basis_pows = [(0, 0), (1, 0), (0, 1), (2, 0), (0, 2), (1, 1)]
    for i, (pi, qi) in enumerate(basis_pows):
        for j, (pj, qj) in enumerate(basis_pows):
            g[i, j] = m(pi + pj) * m(qi + qj)
    ginv = np.linalg.inv(g)
    return (k0.astype(np.float32), k1.astype(np.float32),
            k2.astype(np.float32), ginv.astype(np.float32))


@lru_cache(maxsize=None)
def _corr_matrix(n: int, taps: tuple, mode: str = "edge") -> np.ndarray:
    """Dense ``(n, n)`` banded correlation matrix for a 1-D kernel with
    replicate ("edge") boundary handling:
    ``out[i] = sum_d taps[d] * in[clamp(i + d - r)]``.

    Correlations as matmuls keep the MXU busy; a channels=1 convolution
    would use 1/128 of the TPU's lanes (the reference-shaped images have no
    channel axis to vectorise over).
    """
    k = len(taps)
    r = k // 2
    m = np.zeros((n, n), np.float32)
    for i in range(n):
        for d, t in enumerate(taps):
            j = i + d - r
            j = min(max(j, 0), n - 1) if mode == "edge" else j
            if 0 <= j < n:
                m[i, j] += t
    return m


# Correlation matmul dtype.  bfloat16 operands with float32 accumulation
# change the recovered flow by < 0.02 px on the validation workloads while
# doubling MXU throughput; set to jnp.float32 for parity audits.
CORR_DTYPE = jnp.bfloat16


def _corr_w(x: jnp.ndarray, taps) -> jnp.ndarray:
    """1-D correlation along the last (W) axis of ``(..., H, W)``."""
    m = jnp.asarray(_corr_matrix(x.shape[-1], tuple(np.asarray(taps).tolist())))
    return jnp.einsum("...j,ij->...i", x.astype(CORR_DTYPE),
                      m.astype(CORR_DTYPE),
                      preferred_element_type=jnp.float32)


def _corr_h(x: jnp.ndarray, taps) -> jnp.ndarray:
    """1-D correlation along the second-to-last (H) axis of ``(..., H, W)``."""
    m = jnp.asarray(_corr_matrix(x.shape[-2], tuple(np.asarray(taps).tolist())))
    return jnp.einsum("...hw,ih->...iw", x.astype(CORR_DTYPE),
                      m.astype(CORR_DTYPE),
                      preferred_element_type=jnp.float32)


def _sep_corr(x: jnp.ndarray, taps_w, taps_h) -> jnp.ndarray:
    return _corr_h(_corr_w(x, taps_w), taps_h)


def poly_expansion(img, n: int = 5, sigma: float = 1.2):
    """Quadratic polynomial expansion of ``(N, H, W)`` images.

    Returns ``(N, H, W, 5)`` stacked (bx, by, axx, ayy, axy) maps for the
    local model f(dx) ~ dx^T A dx + b^T dx + c with
    A = [[axx, axy/2], [axy/2, ayy]].

    Accepts a trailing singleton channel for backward compatibility.
    """
    if img.ndim == 4 and img.shape[-1] == 1:
        img = img[..., 0]
    k0, k1, k2, ginv = _poly_kernels(n, sigma)

    # Separable moment correlations: W-axis kernel x H-axis kernel, each a
    # dense banded matmul.
    x0 = _corr_w(img, k0)
    x1 = _corr_w(img, k1)
    x2 = _corr_w(img, k2)
    c = jnp.stack([
        _corr_h(x0, k0),   # w
        _corr_h(x1, k0),   # w*x
        _corr_h(x0, k1),   # w*y
        _corr_h(x2, k0),   # w*x^2
        _corr_h(x0, k2),   # w*y^2
        _corr_h(x1, k1),   # w*x*y
    ], axis=-1)                                   # (N, H, W, 6)
    coeff = jnp.einsum("...i,ji->...j", c, jnp.asarray(ginv).astype(c.dtype))
    return coeff[..., 1:6]                        # drop the constant term


# --------------------------------------------------------------------------
# Flow estimation
# --------------------------------------------------------------------------

def _bilinear_warp(fields, flow_x, flow_y, use_pallas: bool | None = None):
    """Sample ``fields`` (N, H, W, C) at (x + flow_x, y + flow_y), clamped.

    On TPU backends this dispatches to the Pallas kernel
    (ops/pallas/warp.py) that rewrites the gather as a two-hot MXU matmul +
    vertical two-hot mask-reduce — XLA's general gather is the step's
    dominant cost (~60 ms per 2M positions, BENCH_NOTES.md).

    The XLA path below fuses one gather over all C channels (the 5
    poly-coefficient maps).  Measured alternatives that did NOT help
    (BENCH_NOTES.md): warping a single channel and re-expanding (gather cost
    is per position), packing the four bilinear corners into 4C channels for
    a single gather (XLA already amortises the four corner fetches), 2-D
    advanced indexing, bf16 operands, and take_along_axis (10x slower).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        import os

        from vfd_gan_tpu.ops.pallas.warp import bilinear_warp_pallas
        return bilinear_warp_pallas(
            fields, flow_x, flow_y,
            variant=os.environ.get("VFD_WARP_VARIANT", "v5"))
    n, h, w, c = fields.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None] + flow_y
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :] + flow_x
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys); x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]; wx = (xs - x0)[..., None]
    y0 = y0.astype(jnp.int32); x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1); x1 = jnp.minimum(x0 + 1, w - 1)

    flat = fields.reshape(n, h * w, c)
    bidx = jnp.arange(n)[:, None, None]

    def at(yy, xx):
        return flat[bidx, yy * w + xx]          # (N, H, W, C)

    top = at(y0, x0) * (1 - wx) + at(y0, x1) * wx
    bot = at(y1, x0) * (1 - wx) + at(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def _box_blur_stack(stack, k):
    """(N, H, W, C) box filter over H, W via banded matmuls."""
    taps = np.full((k,), 1.0 / k, np.float32)
    moved = jnp.moveaxis(stack, -1, 1)          # (N, C, H, W)
    out = _sep_corr(moved, taps, taps)
    return jnp.moveaxis(out, 1, -1)


def _flow_level(p1, p2, flow, winsize: int, iterations: int):
    """Iterative displacement refinement at one pyramid level.

    Warps the five stacked polynomial-coefficient maps of the second frame
    by the current flow in ONE fused bilinear gather (gather cost on TPU is
    per *position*, so fusing channels is free — warping the raw image and
    re-expanding was measured slower), then solves the box-blurred 2x2
    normal equations in closed form.

    p1/p2: stacked poly expansions ``(N, H, W, 5)`` = (bx, by, axx, ayy,
    axy); flow: (N, H, W, 2) displacement in (x, y) order like cv2.
    """
    b1x, b1y = p1[..., 0], p1[..., 1]
    a1xx, a1yy, a1xy = p1[..., 2], p1[..., 3], p1[..., 4]

    def body(i, flow):
        fx, fy = flow[..., 0], flow[..., 1]
        w2 = _bilinear_warp(p2, fx, fy)
        # average the quadratic term, difference of linear terms
        axx = (a1xx + w2[..., 2]) * 0.5
        ayy = (a1yy + w2[..., 3]) * 0.5
        axy = ((a1xy + w2[..., 4]) * 0.5) * 0.5   # off-diagonal of A
        dbx = -0.5 * (w2[..., 0] - b1x) + axx * fx + axy * fy
        dby = -0.5 * (w2[..., 1] - b1y) + axy * fx + ayy * fy

        # accumulate normal equations over the window: G = A^T A, h = A^T db
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
        new_fx = (g22 * h1 - g12 * h2) / det
        new_fy = (g11 * h2 - g12 * h1) / det
        return jnp.stack([new_fx, new_fy], axis=-1)

    if os.environ.get("VFD_FLOW_UNROLL", "0") != "0":
        # Unroll experiment: iteration count is static (3), and the while
        # loop pins carry layouts (profiled f32 21/14-channel relayout
        # copies at the loop boundary) plus ~ms-scale loop overhead.
        for i in range(iterations):
            flow = body(i, flow)
        return flow
    if (jax.default_backend() == "tpu"
            and os.environ.get("VFD_FLOW_REFINE", "0") != "0"):
        # two-kernel composition (warp + solve per iteration) — superseded
        # by the fused single-kernel path below (exact e2e tie when it
        # landed; kept for A/B comparisons, BENCH_NOTES.md round 5/6).
        return _flow_level_pallas(p1, p2, flow, winsize, iterations)
    if (jax.default_backend() == "tpu"
            and os.environ.get("VFD_FLOW_FUSED", "1") != "0"):
        # TPU production default since the round-6 e2e A/B (42.1 -> 42.8
        # clips/s): ALL iterations' warp+solve in ONE kernel, every
        # intermediate VMEM-resident.  VFD_FLOW_FUSED=0 restores the
        # XLA fori_loop body (with the Pallas warp inside).
        return _flow_level_fused(p1, p2, flow, winsize, iterations)
    return jax.lax.fori_loop(0, iterations, body, flow)


def _flow_level_pallas(p1, p2, flow, winsize: int, iterations: int,
                       *, interpret: bool = False):
    """TPU production path of ``_flow_level``: per-iteration, the tuned
    one-hot-matmul warp kernel (ops/pallas/warp.py) then the whole-plane
    refinement-solve kernel (ops/pallas/flow_refine.py).  Identical math to
    the XLA body — the elementwise algebra runs f32 and the box blur keeps
    the CORR_DTYPE bf16-operand/f32-accumulate contract — but with every
    intermediate VMEM-resident instead of the profiled ~2.3 ms/iteration of
    while-loop fusion relayouts (BENCH_NOTES.md round-4/5).

    ``interpret=True`` runs both kernels in interpreter mode so tests can
    pin equality against the XLA body on CPU.
    """
    from vfd_gan_tpu.ops.pallas.flow_refine import flow_refine_step_pallas
    from vfd_gan_tpu.ops.pallas.warp import bilinear_warp_pallas

    p1p = jnp.moveaxis(p1, -1, 1)                 # (N, 5, H, W)
    flowp = jnp.moveaxis(flow, -1, 1)             # (N, 2, H, W)
    variant = os.environ.get("VFD_WARP_VARIANT", "v5")
    for _ in range(iterations):
        w2 = bilinear_warp_pallas(
            p2, flowp[:, 0], flowp[:, 1], variant=variant,
            channel_planar=True, interpret=interpret)
        flowp = flow_refine_step_pallas(p1p, w2, flowp, winsize,
                                        interpret=interpret)
    return jnp.moveaxis(flowp, 1, -1)


def _flow_level_fused(p1, p2, flow, winsize: int, iterations: int,
                      *, interpret: bool = False):
    """Single-kernel TPU path of ``_flow_level``: ALL ``iterations``
    rounds of {v5-banded warp, box-blurred 2x2 solve} run inside ONE
    Pallas kernel with every intermediate VMEM-resident
    (ops/pallas/flow_fused.py) — no per-iteration dispatches, no HBM
    round trips for the warped planes or the flow carry.  Same math and
    the same |flow_y| band clamp as the two-kernel ``VFD_FLOW_REFINE``
    composition (PARITY.md "TPU warp band clamp")."""
    from vfd_gan_tpu.ops.pallas.flow_fused import flow_refine_fused_pallas

    out = flow_refine_fused_pallas(
        jnp.moveaxis(p1, -1, 1), jnp.moveaxis(p2, -1, 1),
        jnp.moveaxis(flow, -1, 1), winsize, iterations,
        interpret=interpret)
    return jnp.moveaxis(out, 1, -1)


def _gauss_blur(img, sigma: float):
    r = max(1, int(3 * sigma + 0.5))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    taps = (k / k.sum()).astype(np.float32)
    return _sep_corr(img, taps, taps)


def farneback_flow(prev, cur, *, pyr_scale: float = 0.5, levels: int = 3,
                   winsize: int = 15, iterations: int = 3, poly_n: int = 5,
                   poly_sigma: float = 1.2):
    """Dense flow for grayscale image batches ``(N, H, W)`` -> ``(N, H, W, 2)``
    in (x, y) displacement order (cv2 convention, lib/utils.py:114-115)."""
    h, w = prev.shape[-2:]
    prev = prev.astype(jnp.float32)
    cur = cur.astype(jnp.float32)

    # Gaussian pyramid (coarsest last); shapes mirror cv2's 0.5 scaling.
    # prev/cur ride ONE concatenated batch through the blur+resize chain —
    # halves the per-level dispatch count (flow-pyramid batching A/B,
    # BENCH_NOTES round 4).
    pyramid = [(prev, cur)]
    both = jnp.concatenate([prev, cur], axis=0)
    for _ in range(1, levels):
        nh = max(2, both.shape[-2] // 2)
        nw = max(2, both.shape[-1] // 2)
        both = resize_bilinear(_gauss_blur(both, 1.0)[..., None],
                               (nh, nw))[..., 0]
        pyramid.append(tuple(jnp.split(both, 2, axis=0)))

    flow = jnp.zeros(pyramid[-1][0].shape + (2,), jnp.float32)
    for li in range(levels - 1, -1, -1):
        p, c = pyramid[li]
        if li != levels - 1:
            nh, nw = p.shape[-2:]
            flow = resize_bilinear(flow, (nh, nw)) / pyr_scale
        # expand both frames in one batched call
        both = poly_expansion(jnp.concatenate([p, c], axis=0), poly_n,
                              poly_sigma)
        p1, p2 = jnp.split(both, 2, axis=0)
        flow = _flow_level(p1, p2, flow, winsize, iterations)
    return flow


# --------------------------------------------------------------------------
# Flow video encoding (reference video_to_flow equivalent)
# --------------------------------------------------------------------------

def _hsv_to_rgb(h_deg_half, v):
    """OpenCV uint8-style HSV->RGB with S=1: hue in [0, 180), value [0, 1]."""
    h6 = h_deg_half * 2.0 / 60.0
    i = jnp.floor(h6)
    f = h6 - i
    p = jnp.zeros_like(v)
    q = v * (1.0 - f)
    t = v * f
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def flow_to_rgb(flow):
    """HSV-encode flow ``(..., H, W, 2)`` the reference way
    (lib/utils.py:116-120): hue = angle_deg/2, sat = max, value = per-frame
    min-max-normalised magnitude; returns RGB in [0, 1]."""
    fx, fy = flow[..., 0], flow[..., 1]
    mag = jnp.sqrt(fx * fx + fy * fy)
    ang = jnp.rad2deg(jnp.arctan2(fy, fx)) % 360.0
    v = minmax_normalize(mag, axis=(-2, -1))
    return _hsv_to_rgb(ang * 0.5, v)


def video_to_flow_rgb(video, scale: float = 1.0, streams: int = 1):
    """Reference ``video_to_flow`` equivalent, fully on device.

    Input: RGB video ``(B, T, H, W, 3)`` in [-1, 1].  Pipeline
    (lib/utils.py:94-129): per-time-slab min-max normalise to [0, 1] across
    the batch, grayscale, Farneback flow over consecutive pairs, HSV->RGB
    encode, duplicate the last flow frame to keep T frames, scale to [-1, 1].
    Output: ``(B, T, H, W, 3)`` float32 in [-1, 1].

    ``streams > 1`` treats the batch axis as ``streams`` equal contiguous
    groups and min-max normalises each group's time slabs independently.
    The reference calls ``video_to_flow`` separately per video stream
    (gt then predicted mask, models/mygannet.py:281-282), so each stream is
    contrast-stretched on its own before Farneback; callers that batch both
    streams into one flow call for throughput must pass ``streams=2`` to
    keep that per-stream normalisation (a joint min-max lets the binary gt
    slab pin the range and the sigmoid prediction is never stretched).

    ``scale < 1`` computes flow at reduced resolution and upsamples the
    encoded RGB — a perf knob (the warp gather dominates flow cost and
    shrinks quadratically).  The HSV encoding is invariant to uniform flow
    scaling (hue is an angle, value is per-frame min-max normalised), so
    this only smooths fine motion detail.  Default 1.0 = full fidelity.
    """
    b, t, h, w, _ = video.shape
    # per-frame-index normalisation over (B/streams, H, W, C) per stream —
    # the reference normalises each time slab of one video stream's batch
    # jointly (lib/utils.py:96), one call per stream.
    assert b % streams == 0, (b, streams)
    grouped = video.reshape(streams, b // streams, t, h, w, 3)
    slabs = jnp.moveaxis(grouped, 2, 1)          # (streams, T, B/s, H, W, C)
    norm = jax.vmap(jax.vmap(minmax_normalize))(slabs)
    norm = jnp.moveaxis(norm, 1, 2).reshape(b, t, h, w, 3)
    gray = (0.299 * norm[..., 0] + 0.587 * norm[..., 1]
            + 0.114 * norm[..., 2]) * 255.0

    fh, fw = h, w
    if scale < 1.0:
        fh, fw = max(8, int(h * scale)), max(8, int(w * scale))
        gray = resize_bilinear(gray[..., None], (fh, fw))[..., 0]

    prev = gray[:, :-1].reshape(b * (t - 1), fh, fw)
    cur = gray[:, 1:].reshape(b * (t - 1), fh, fw)

    # XLA's warp gather has a per-field cost cliff past ~128 fields @128^2
    # (BENCH_NOTES.md), dodged by processing pair batches in sequential
    # lax.map chunks.  The Pallas warp kernel (TPU backends) has no cliff —
    # it scales sub-linearly with batch — so there the full batch goes
    # through in one call (chunking would only shrink its matmuls).
    n = prev.shape[0]

    def _chunk_size(n):
        if jax.default_backend() == "tpu":
            return n
        for cap in (32, 128):
            best = max((d for d in range(1, cap + 1) if n % d == 0),
                       default=1)
            if best >= min(8, n):
                return best
        return n

    chunk = _chunk_size(n)
    if chunk < n:
        flow = jax.lax.map(
            lambda pc: farneback_flow(pc[0], pc[1]),
            (prev.reshape(n // chunk, chunk, fh, fw),
             cur.reshape(n // chunk, chunk, fh, fw)))
        flow = flow.reshape(b, t - 1, fh, fw, 2)
    else:
        flow = farneback_flow(prev, cur).reshape(b, t - 1, fh, fw, 2)
    rgb = flow_to_rgb(flow)
    if (fh, fw) != (h, w):
        rgb = resize_bilinear(rgb, (h, w))
    rgb = jnp.concatenate([rgb, rgb[:, -1:]], axis=1)  # duplicate last frame
    return rgb * 2.0 - 1.0
