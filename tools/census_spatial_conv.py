#!/usr/bin/env python
"""Census: every spatial_conv call (shape, kernel, stride) in one fused
MyGAN train step at the bench workload, by tracing on CPU.

Run: JAX_PLATFORMS=cpu python tools/census_spatial_conv.py
"""
from __future__ import annotations

import collections
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from vfd_gan_tpu.config import Config
from vfd_gan_tpu.ops import convs
from vfd_gan_tpu.ops.augment import staging_size

calls = collections.Counter()
_orig = convs.spatial_conv


def _spy(x, kernel, *, stride=1, padding="SAME"):
    calls[(tuple(x.shape), tuple(kernel.shape), stride)] += 1
    return _orig(x, kernel, stride=stride, padding=padding)


convs.spatial_conv = _spy
import vfd_gan_tpu.models.layers as layers
layers.spatial_conv = _spy

from vfd_gan_tpu.train.gan_engine import MyGanEngine

BATCH, NFR, ISIZE = 4, 16, 128
tmp = tempfile.mkdtemp(prefix="census_")
cfg = Config(model="mygan", isize=ISIZE, nfr=NFR, batchsize=BATCH,
             ngf=32, ndf=32, ep=1, freq=10 ** 9, compute_dtype="bfloat16",
             tensorboard=False, result_root=tmp).validate()
engine = MyGanEngine(cfg, train_iter=None, test_iter=None)
s = staging_size(ISIZE)
batch = {
    "data": jnp.zeros((BATCH, NFR, s, s, 3), jnp.uint8),
    "real": jnp.zeros((BATCH, NFR, s, s, 3), jnp.uint8),
    "mask": jnp.zeros((BATCH, NFR, s, s, 1), jnp.uint8),
    "label": jnp.ones((BATCH, NFR), jnp.float32),
}
calls.clear()
jax.eval_shape(engine._train_step, engine.g_state, engine.d_state, batch,
               jax.random.key(0))
total = 0
for (xs, ks, st), n in sorted(calls.items()):
    b, t, h, w, c = xs
    kh, kw, cin, cout = ks
    flops = 2 * b * t * (h // st) * (w // st) * kh * kw * cin * cout * n
    total += flops
    print(f"x={xs} k={ks} stride={st} x{n}  ({flops/1e9:.1f} GFLOP fwd)")
print(f"total spatial-conv fwd: {total/1e9:.1f} GFLOP")
