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

from functools import lru_cache, partial

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


def _corr1d(img, kernel, axis):
    """Depthwise 1-D correlation along H or W with edge replication."""
    k = kernel.shape[0]
    r = k // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    img = jnp.pad(img, pad, mode="edge")
    kern = kernel.reshape((k, 1, 1, 1) if axis == 1 else (1, k, 1, 1))
    return jax.lax.conv_general_dilated(
        img, kern.astype(img.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def poly_expansion(img, n: int = 5, sigma: float = 1.2):
    """Quadratic polynomial expansion of ``(N, H, W, 1)`` images.

    Returns (bx, by, axx, ayy, axy) maps for the local model
    f(dx) ~ dx^T A dx + b^T dx + c with A = [[axx, axy/2], [axy/2, ayy]].
    """
    k0, k1, k2, ginv = _poly_kernels(n, sigma)
    k0, k1, k2 = (jnp.asarray(k) for k in (k0, k1, k2))

    # Separable moment correlations: row kernel (x-axis=W) x col kernel (H).
    c00 = _corr1d(_corr1d(img, k0, 2), k0, 1)   # w
    c10 = _corr1d(_corr1d(img, k1, 2), k0, 1)   # w*x
    c01 = _corr1d(_corr1d(img, k0, 2), k1, 1)   # w*y
    c20 = _corr1d(_corr1d(img, k2, 2), k0, 1)   # w*x^2
    c02 = _corr1d(_corr1d(img, k0, 2), k2, 1)   # w*y^2
    c11 = _corr1d(_corr1d(img, k1, 2), k1, 1)   # w*x*y

    c = jnp.stack([c00, c10, c01, c20, c02, c11], axis=-1)  # (N,H,W,1,6)
    coeff = jnp.einsum("...i,ji->...j", c, jnp.asarray(ginv))
    bx, by = coeff[..., 0, 1], coeff[..., 0, 2]
    axx, ayy, axy = coeff[..., 0, 3], coeff[..., 0, 4], coeff[..., 0, 5]
    return bx, by, axx, ayy, axy


# --------------------------------------------------------------------------
# Flow estimation
# --------------------------------------------------------------------------

def _bilinear_warp(field, flow_x, flow_y):
    """Sample ``field`` (N, H, W) at (x + flow_x, y + flow_y), clamped."""
    n, h, w = field.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None] + flow_y
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :] + flow_x
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys); x0 = jnp.floor(xs)
    wy = ys - y0; wx = xs - x0
    y0 = y0.astype(jnp.int32); x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1); x1 = jnp.minimum(x0 + 1, w - 1)

    flat = field.reshape(n, h * w)
    bidx = jnp.arange(n)[:, None, None]

    def at(yy, xx):
        return flat[bidx, yy * w + xx]

    top = at(y0, x0) * (1 - wx) + at(y0, x1) * wx
    bot = at(y1, x0) * (1 - wx) + at(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def _box_blur(img, k):
    """(N, H, W) box filter with edge padding (cv2 flags=0 aggregation)."""
    kern = jnp.full((k,), 1.0 / k, img.dtype)
    x = _corr1d(_corr1d(img[..., None], kern, 2), kern, 1)
    return x[..., 0]


def _flow_level(p1, p2, flow, winsize: int, iterations: int):
    """Iterative displacement refinement at one pyramid level.

    p1/p2: poly expansions (bx, by, axx, ayy, axy) of both frames;
    flow: (N, H, W, 2) initial displacement (x, y order, like cv2).
    """
    b1x, b1y, a1xx, a1yy, a1xy = p1
    b2x, b2y, a2xx, a2yy, a2xy = p2

    def body(i, flow):
        fx, fy = flow[..., 0], flow[..., 1]
        w2 = partial(_bilinear_warp, flow_x=fx, flow_y=fy)
        # average the quadratic term, difference of linear terms
        axx = (a1xx + w2(a2xx)) * 0.5
        ayy = (a1yy + w2(a2yy)) * 0.5
        axy = ((a1xy + w2(a2xy)) * 0.5) * 0.5     # off-diagonal of A
        dbx = -0.5 * (w2(b2x) - b1x) + axx * fx + axy * fy
        dby = -0.5 * (w2(b2y) - b1y) + axy * fx + ayy * fy

        # accumulate normal equations over the window: G = A^T A, h = A^T db
        g11 = _box_blur(axx * axx + axy * axy, winsize)
        g12 = _box_blur(axy * (axx + ayy), winsize)
        g22 = _box_blur(ayy * ayy + axy * axy, winsize)
        h1 = _box_blur(axx * dbx + axy * dby, winsize)
        h2 = _box_blur(axy * dbx + ayy * dby, winsize)

        det = g11 * g22 - g12 * g12
        det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
        new_fx = (g22 * h1 - g12 * h2) / det
        new_fy = (g11 * h2 - g12 * h1) / det
        return jnp.stack([new_fx, new_fy], axis=-1)

    return jax.lax.fori_loop(0, iterations, body, flow)


def _gauss_blur(img, sigma: float):
    r = max(1, int(3 * sigma + 0.5))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    k = jnp.asarray((k / k.sum()).astype(np.float32))
    out = _corr1d(_corr1d(img[..., None], k, 2), k, 1)
    return out[..., 0]


def farneback_flow(prev, cur, *, pyr_scale: float = 0.5, levels: int = 3,
                   winsize: int = 15, iterations: int = 3, poly_n: int = 5,
                   poly_sigma: float = 1.2):
    """Dense flow for grayscale image batches ``(N, H, W)`` -> ``(N, H, W, 2)``
    in (x, y) displacement order (cv2 convention, lib/utils.py:114-115)."""
    h, w = prev.shape[-2:]
    prev = prev.astype(jnp.float32)
    cur = cur.astype(jnp.float32)

    # Gaussian pyramid (coarsest last); shapes mirror cv2's 0.5 scaling.
    pyramid = [(prev, cur)]
    for _ in range(1, levels):
        p, c = pyramid[-1]
        nh, nw = max(2, p.shape[-2] // 2), max(2, p.shape[-1] // 2)
        blur_p, blur_c = _gauss_blur(p, 1.0), _gauss_blur(c, 1.0)
        pyramid.append((
            resize_bilinear(blur_p[..., None], (nh, nw))[..., 0],
            resize_bilinear(blur_c[..., None], (nh, nw))[..., 0]))

    flow = jnp.zeros(pyramid[-1][0].shape + (2,), jnp.float32)
    for li in range(levels - 1, -1, -1):
        p, c = pyramid[li]
        if li != levels - 1:
            nh, nw = p.shape[-2:]
            flow = resize_bilinear(flow, (nh, nw)) / pyr_scale
        p1 = poly_expansion(p[..., None], poly_n, poly_sigma)
        p2 = poly_expansion(c[..., None], poly_n, poly_sigma)
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


def video_to_flow_rgb(video):
    """Reference ``video_to_flow`` equivalent, fully on device.

    Input: RGB video ``(B, T, H, W, 3)`` in [-1, 1].  Pipeline
    (lib/utils.py:94-129): per-time-slab min-max normalise to [0, 1] across
    the batch, grayscale, Farneback flow over consecutive pairs, HSV->RGB
    encode, duplicate the last flow frame to keep T frames, scale to [-1, 1].
    Output: ``(B, T, H, W, 3)`` float32 in [-1, 1].
    """
    b, t, h, w, _ = video.shape
    # per-frame-index normalisation over (B, H, W, C) — the reference
    # normalises each time slab of the *batch* jointly (lib/utils.py:96).
    norm = minmax_normalize(video, axis=None) if b == 0 else \
        jnp.moveaxis(jax.vmap(lambda s: minmax_normalize(s))(
            jnp.moveaxis(video, 1, 0)), 0, 1)
    gray = (0.299 * norm[..., 0] + 0.587 * norm[..., 1]
            + 0.114 * norm[..., 2]) * 255.0

    prev = gray[:, :-1].reshape(b * (t - 1), h, w)
    cur = gray[:, 1:].reshape(b * (t - 1), h, w)
    flow = farneback_flow(prev, cur).reshape(b, t - 1, h, w, 2)
    rgb = flow_to_rgb(flow)
    rgb = jnp.concatenate([rgb, rgb[:, -1:]], axis=1)  # duplicate last frame
    return rgb * 2.0 - 1.0
