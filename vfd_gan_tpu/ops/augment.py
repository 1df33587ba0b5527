"""Fused on-device clip augmentation.

Replaces the reference's host-side videotransforms pipeline
(lib/data.py:123-135): Resize(1.1*isize) -> RandomRotation(10) ->
RandomCrop(isize) -> RandomHorizontalFlip -> Resize(isize) -> ClipToTensor.
The host only decodes and resizes to the fixed staging size S = 11*isize//10;
rotation + crop + flip then compose into a *single gather* per output pixel
executed on device under jit, and the final Resize(isize) is the identity
(the crop already lands at isize — true in the reference pipeline too).

Semantics preserved:
* one random draw per clip, applied identically to every frame of the
  (data, real, mask) triple (lib/data.py:63-67 applies one transform to the
  concatenated 3*nfr frame list);
* rotation matches ``PIL.Image.rotate(angle)`` (counter-clockwise, nearest
  resample, zero fill, centre (W/2, H/2)) — calibrated to bit-exact
  agreement: src = floor(R(-theta) @ (p + .5 - c) + c);
* crop offset is an inclusive ``randint(0, S - isize)`` per clip
  (video_transforms.py:151-153), flip probability 0.5
  (video_transforms.py:46);
* ``ClipToTensor`` scaling: /255, then video streams to [-1, 1] while the
  mask stays in [0, 1] (lib/data.py:68,78).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def staging_size(isize: int) -> int:
    """Host staging resolution: int(isize * 1.1) (lib/data.py:124)."""
    return int(isize * 1.1)


def sample_clip_params(key, batch: int, stage: int, isize: int,
                      degrees: float = 10.0):
    """Per-clip (angle_rad, crop_y, crop_x, flip) draws."""
    k_ang, k_y, k_x, k_f = jax.random.split(key, 4)
    angle = jax.random.uniform(k_ang, (batch,), minval=-degrees,
                               maxval=degrees) * (jnp.pi / 180.0)
    hi = stage - isize + 1  # randint upper bound is inclusive in the reference
    crop_y = jax.random.randint(k_y, (batch,), 0, hi)
    crop_x = jax.random.randint(k_x, (batch,), 0, hi)
    flip = jax.random.bernoulli(k_f, 0.5, (batch,))
    return angle, crop_y, crop_x, flip


def _src_coords(angle, crop_y, crop_x, flip, s: int, isize: int):
    """Floored (src_x, src_y) f32 maps ``(isize, isize)`` for one clip's
    rotate+crop+flip draw (PIL.Image.rotate nearest-resample calibration,
    see module docstring)."""
    cx = cy = s / 2.0
    out_x = jnp.arange(isize, dtype=jnp.float32)
    out_y = jnp.arange(isize, dtype=jnp.float32)
    # flip acts on the cropped result -> mirror the output column index
    out_x = jnp.where(flip, isize - 1.0 - out_x, out_x)
    x = out_x[None, :] + crop_x + 0.5 - cx          # (1, isize)
    y = out_y[:, None] + crop_y + 0.5 - cy          # (isize, 1)

    cos, sin = jnp.cos(angle), jnp.sin(angle)
    src_x = jnp.floor(cos * x - sin * y + cx)
    src_y = jnp.floor(sin * x + cos * y + cy)
    return (jnp.broadcast_to(src_x, (isize, isize)),
            jnp.broadcast_to(src_y, (isize, isize)))


def _warp_clip(frames, angle, crop_y, crop_x, flip, isize: int):
    """Rotate+crop+flip one clip ``(T, S, S, C)`` via a single gather."""
    t, s, _, c = frames.shape
    src_x, src_y = _src_coords(angle, crop_y, crop_x, flip, s, isize)
    src_x = src_x.astype(jnp.int32)
    src_y = src_y.astype(jnp.int32)

    valid = ((src_x >= 0) & (src_x < s) & (src_y >= 0) & (src_y < s))
    flat = jnp.clip(src_y, 0, s - 1) * s + jnp.clip(src_x, 0, s - 1)
    gathered = jnp.take(frames.reshape(t, s * s, c), flat.reshape(-1), axis=1)
    gathered = gathered.reshape(t, isize, isize, c)
    return jnp.where(valid[None, :, :, None], gathered, 0)


def augment_clips(key, data, real, mask, isize: int, degrees: float = 10.0,
                  use_pallas: bool | None = None, interpret: bool = False):
    """Jointly augment a staged batch; returns float32 (data, real, mask).

    Inputs: uint8 ``(B, T, S, S, C)`` with S = staging_size(isize).
    Outputs: data/real in [-1, 1], mask in [0, 1], all ``(B, T, isize,
    isize, C)``.

    ``use_pallas=True`` routes the gather through the one-hot MXU-matmul
    kernel (ops/pallas/augment.py; bit-exact vs the XLA gather).  It is
    OFF by default: measured 4.18 ms vs the XLA uint8 gather's 2.13 ms at
    the reference workload (tools/bench_augment.py; the kernel's MXU bound
    is K-padded 140->256, and uint8 gathers are ~3x cheaper per position
    than the f32 flow-warp gathers were) — kept as a measured experiment,
    BENCH_NOTES.md "Augment one-hot kernel".
    """
    b, _, s, _, _ = data.shape
    angle, crop_y, crop_x, flip = sample_clip_params(key, b, s, isize, degrees)

    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        from vfd_gan_tpu.ops.pallas.augment import augment_gather_pallas
        src_x, src_y = jax.vmap(_src_coords, in_axes=(0, 0, 0, 0, None, None)
                                )(angle, crop_y, crop_x, flip, s, isize)
        joint = jnp.concatenate([data, real, mask], axis=-1)
        out = augment_gather_pallas(joint, src_x, src_y, isize,
                                    interpret=interpret)
        cd, cr = data.shape[-1], real.shape[-1]
        d, r, m = (out[..., :cd], out[..., cd:cd + cr], out[..., cd + cr:])
    else:
        warp = jax.vmap(_warp_clip, in_axes=(0, 0, 0, 0, 0, None))
        d = warp(data, angle, crop_y, crop_x, flip, isize)
        r = warp(real, angle, crop_y, crop_x, flip, isize)
        m = warp(mask, angle, crop_y, crop_x, flip, isize)
    d = d.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    r = r.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    m = m.astype(jnp.float32) / 255.0
    return d, r, m


def normalize_clips(data, real, mask):
    """Test-time preprocessing (no geometry): /255 scaling only
    (lib/data.py:132-135 — Resize(isize) happens at the host staging step)."""
    d = data.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    r = real.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    m = mask.astype(jnp.float32) / 255.0
    return d, r, m
