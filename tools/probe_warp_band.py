"""Probe: per-row-block source-row spread of real Farneback warp calls.

The banded warp-kernel idea only wins if, for an output row-block of
BI=8 rows x all W columns, the bilinear source rows (y0..y1) of every
pixel fit a K-row band.  This instruments ops.flow._bilinear_warp and
records the max block spread per warp call on (a) moving-blob mask
videos (the real workload: gt masks + sigmoid predictions) and (b)
uniform-noise videos (worst case ~ an untrained generator's output).

Run on CPU: JAX_PLATFORMS handled in-script like tests/conftest.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from vfd_gan_tpu.ops import flow as flow_mod

SPREADS = []  # (H, max_spread, p99_spread) per warp call


def _record(h, table):
    SPREADS.append((int(h), np.asarray(table)))


def _probe_warp(fields, flow_x, flow_y, use_pallas=None):
    n, h, w, c = fields.shape
    bi = next(b for b in (8, 4, 2, 1) if h % b == 0)
    ys = jnp.clip(jnp.arange(h, dtype=jnp.float32)[None, :, None]
                  + flow_y, 0.0, h - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)          # (N, H, W)
    spreads = []
    for wb in (w, 32, 16, 8):
        yt = y0.reshape(n, h // bi, bi, w // wb, wb)
        yt = jnp.moveaxis(yt, 3, 2).reshape(n, (h // bi) * (w // wb), bi * wb)
        s = (yt.max(-1) - yt.min(-1)).astype(jnp.float32)
        spreads.append(jnp.stack([s.max(), jnp.percentile(s, 99.0),
                                  jnp.percentile(s, 90.0)]))
    jax.debug.callback(_record, jnp.int32(h), jnp.stack(spreads))
    return ORIG(fields, flow_x, flow_y, use_pallas=False)


ORIG = flow_mod._bilinear_warp
flow_mod._bilinear_warp = _probe_warp


def blob_video(b, t, h, w, seed):
    rng = np.random.default_rng(seed)
    vid = np.zeros((b, t, h, w, 3), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for bi_ in range(b):
        nblob = rng.integers(1, 4)
        for _ in range(nblob):
            cy, cx = rng.uniform(0, h), rng.uniform(0, w)
            vy, vx = rng.uniform(-3, 3, 2)
            r = rng.uniform(5, 15)
            for ti in range(t):
                m = ((yy - (cy + vy * ti)) ** 2
                     + (xx - (cx + vx * ti)) ** 2) < r * r
                vid[bi_, ti][m] = 1.0
    return vid * 2.0 - 1.0


def noise_video(b, t, h, w, seed):
    rng = np.random.default_rng(seed)
    # sigmoid of random logits ~ untrained generator output
    logits = rng.normal(0, 2, (b, t, h, w, 1)).astype(np.float32)
    sig = 1 / (1 + np.exp(-logits))
    return np.repeat(sig, 3, axis=-1) * 2.0 - 1.0


def run(tag, vid):
    SPREADS.clear()
    # run WITHOUT jit so the python-level probe sees concrete values
    flow_mod.video_to_flow_rgb(jnp.asarray(vid), streams=1)
    by_h = {}
    for h, table in SPREADS:
        by_h.setdefault(h, []).append(table)
    print(f"== {tag} ==")
    for h in sorted(by_h, reverse=True):
        t = np.max(np.stack(by_h[h]), axis=0)  # (n_wb, 3)
        for wb, row in zip((128 if h>=128 else h, 32, 16, 8), t):
            print(f"  H={h:4d} wb={wb:4d}: max={row[0]:6.1f} "
                  f"p99={row[1]:6.1f} p90={row[2]:6.1f}")


if __name__ == "__main__":
    run("blobs b2t8 128^2", blob_video(2, 8, 128, 128, 0))
    run("noise b2t8 128^2", noise_video(2, 8, 128, 128, 1))
