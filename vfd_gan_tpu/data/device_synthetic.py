"""On-device synthetic batch source (``--synthetic_data``).

TPU-native counterpart of ``data/synthetic.py``'s mp4 generator: the same
moving-inpainted-square forgeries (smooth drifting background, colored
square, boundary-edge GT like the dataset's invert+Canny prep produces —
reference lib/data.py:99-109), but generated *on device* by one jitted
function instead of decoded from disk.

Purpose: soak tests and benchmarking of the full engine loop when the
host->device link (or a missing dataset) would starve the TPU — e.g. this
sandbox's ~150 KB/s tunnel, where a single staged b8 batch would take
minutes to transfer.  Real training uses the mp4 pipeline; this mode keeps
every OTHER part of the loop real (fused train step, periodic sweeps,
checkpoint rule, autosave, SIGTERM parking, exact resume).

Exact-resume contract: like ``ClipBatchIterator``, the stream is a pure
function of ``(seed, epoch, batch_index)`` — iterator state is the same
two ints (``epoch``, ``skip_batches``) the engines already checkpoint.
"""

from __future__ import annotations

import numpy as np


class DeviceSyntheticIterator:
    """Yields device-resident staged batches shaped like ClipBatchIterator's
    host batches: ``data``/``real`` (B,T,S,S,3) u8, ``mask`` (B,T,S,S,1) u8
    in {0,255}, ``label`` (B,T) f32, plus host-side ``index`` ids."""

    def __init__(self, batch_size: int, nfr: int, size: int,
                 n_batches: int, seed: int = 0, p_fake: float = 0.5,
                 thick_masks: bool = False):
        self.batch_size = batch_size
        self.nfr = nfr
        self.size = size
        self.n_batches = n_batches
        self.seed = seed
        self.p_fake = p_fake
        # thick_masks: GT is the FILLED forged square instead of its Canny
        # boundary ring.  The engines score morphology-OPENED binary masks
        # (reference models/mygannet.py:395-399): a 1-px ring opens to
        # all-zero, pinning sweep ROC at 0.5 by construction — so the
        # default-mask soak guards only loss trajectories.  Filled-region
        # GT survives the 5x5 opening, letting the scored ROC move and the
        # soak demonstrate end-to-end *learning* on hardware
        # (tools/soak.py --learning).
        self.thick_masks = thick_masks
        self.epoch = 0
        self.skip_batches = 0
        self._gen = None        # jit-compiled lazily (first iteration)

    def __len__(self) -> int:
        return self.n_batches

    def _build(self):
        import jax
        import jax.numpy as jnp

        b, t, s = self.batch_size, self.nfr, self.size
        p_fake = self.p_fake

        def gen(key):
            kphase, kpos, kvel, kcol, klab = jax.random.split(key, 5)
            f = jnp.arange(t, dtype=jnp.float32)
            yy, xx = jnp.mgrid[0:s, 0:s]
            yyf = yy.astype(jnp.float32) / s
            xxf = xx.astype(jnp.float32) / s
            phase = jax.random.uniform(kphase, (b,), maxval=2 * jnp.pi)
            # (B,T,S,S) drifting gradient — same field as synthetic.py
            g = 0.5 + 0.4 * jnp.sin(
                2 * jnp.pi * (xxf[None, None] + 0.03 * f[None, :, None, None])
                + phase[:, None, None, None]) * jnp.cos(
                2 * jnp.pi * (yyf[None, None] - 0.02 * f[None, :, None, None]))
            bg = jnp.stack([g, jnp.roll(g, 3, axis=2), jnp.roll(g, 5, axis=3)],
                           axis=-1) * 255.0                     # (B,T,S,S,3)

            side = max(4, s // 4)
            pos = jax.random.randint(kpos, (b, 2), 0, s - side)
            vel = jax.random.randint(kvel, (b, 2), -2, 3)
            ycur = jnp.clip(pos[:, :1] + vel[:, :1] * f[None], 0, s - side)
            xcur = jnp.clip(pos[:, 1:] + vel[:, 1:] * f[None], 0, s - side)
            iy = jnp.arange(s, dtype=jnp.float32)
            in_y = ((iy[None, None] >= ycur[..., None])
                    & (iy[None, None] < ycur[..., None] + side))  # (B,T,S)
            in_x = ((iy[None, None] >= xcur[..., None])
                    & (iy[None, None] < xcur[..., None] + side))
            sq = in_y[..., :, None] & in_x[..., None, :]          # (B,T,S,S)
            # boundary ring == what Canny finds on the inverted block mask
            edge_y = ((iy[None, None] == ycur[..., None])
                      | (iy[None, None] == ycur[..., None] + side - 1))
            edge_x = ((iy[None, None] == xcur[..., None])
                      | (iy[None, None] == xcur[..., None] + side - 1))
            edge = ((edge_y[..., :, None] & in_x[..., None, :])
                    | (in_y[..., :, None] & edge_x[..., None, :]))

            color = jax.random.randint(kcol, (b, 3), 0, 255).astype(jnp.float32)
            fake = jnp.where(sq[..., None], color[:, None, None, None, :], bg)

            is_fake = (jax.random.uniform(klab, (b,)) < p_fake)
            sel = is_fake[:, None, None, None, None]
            data = jnp.where(sel, fake, bg)
            gt = sq if self.thick_masks else edge
            mask = jnp.where(sel, gt[..., None], False)
            return {
                "data": jnp.clip(data, 0, 255).astype(jnp.uint8),
                "real": jnp.clip(bg, 0, 255).astype(jnp.uint8),
                "mask": (mask.astype(jnp.uint8) * 255),
                "label": jnp.broadcast_to(
                    is_fake.astype(jnp.float32)[:, None], (b, t)),
            }

        self._jit_gen = jax.jit(gen)

        def keyed(epoch: int, i: int):
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.key(self.seed), epoch), i)
            return self._jit_gen(key)

        return keyed

    def __iter__(self):
        if self._gen is None:
            self._gen = self._build()
        epoch = self.epoch
        start = min(self.skip_batches, self.n_batches)
        self.skip_batches = 0
        self.epoch += 1
        for i in range(start, self.n_batches):
            batch = dict(self._gen(epoch, i))
            # stable per-window ids so per-clip caches (--cache_gt_flow) key
            # consistently across sweeps, as with the mp4 iterator
            batch["index"] = (np.arange(self.batch_size, dtype=np.int32)
                              + i * self.batch_size)
            yield batch
