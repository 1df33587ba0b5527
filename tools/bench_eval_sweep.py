#!/usr/bin/env python
"""Measure the periodic-test sweep cost on TPU, with and without the
``--cache_gt_flow`` gt-flow reuse (VERDICT r2 Next #6).

The eval path runs every ``freq`` steps and sweeps the whole test split;
its per-batch cost is one `_eval_step` (normalise, G forward, TWO
Farneback flow streams, dual-D eval passes, morphology) vs one
`_eval_step_cached` (same minus the gt-mask flow stream, which is static
per clip and reused from the first sweep).  Batches are generated on
device (the tunnel's 150 KB/s host link is not the object of measurement)
and timed bench.py-style: STEPS dispatches then one scalar fetch.

Prints one JSON line with ms/batch for both paths.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("BENCH_STEPS", 10))
BATCH = int(os.environ.get("BENCH_BATCH", 4))
NFR = 16
ISIZE = 128


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vfd_gan_tpu.config import Config
    from vfd_gan_tpu.train.gan_engine import MyGanEngine
    from vfd_gan_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    tmp = tempfile.mkdtemp(prefix="bench_eval_")
    cfg = Config(model="mygan", isize=ISIZE, nfr=NFR, batchsize=BATCH,
                 ngf=32, ndf=32, ep=1, freq=10 ** 9,
                 compute_dtype="bfloat16", tensorboard=False,
                 result_root=tmp).validate()
    engine = MyGanEngine(cfg, train_iter=None, test_iter=None)
    # test batches are staged at isize directly (no augmentation crop,
    # lib/data.py:132-135) — unlike the train path's staging_size
    s = ISIZE

    @jax.jit
    def make_batch(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "data": jax.random.randint(k1, (BATCH, NFR, s, s, 3), 0, 255,
                                       jnp.uint8),
            "real": jax.random.randint(k2, (BATCH, NFR, s, s, 3), 0, 255,
                                       jnp.uint8),
            "mask": (jax.random.randint(k3, (BATCH, NFR, s, s, 1), 0, 2,
                                        jnp.uint8) * 255).astype(jnp.uint8),
            "label": jnp.ones((BATCH, NFR), jnp.float32),
        }

    batch = make_batch(jax.random.key(1))
    g, d = engine.g_state, engine.d_state

    # warm both programs + build the gt-flow cache input
    gt, m_pre, metrics, viz, gt_flow = engine._eval_step(g, d, batch)
    float(metrics["g/err_g_con/test"])
    clips = tuple(gt_flow[j] for j in range(BATCH))
    out_c = engine._eval_step_cached(g, d, batch, clips)
    float(out_c[2]["g/err_g_con/test"])

    def timed(fn):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn()
        float(out[2]["g/err_g_con/test"])
        return (time.perf_counter() - t0) / STEPS * 1e3

    ms_uncached = timed(lambda: engine._eval_step(g, d, batch))
    ms_cached = timed(lambda: engine._eval_step_cached(g, d, batch, clips))

    print(json.dumps({
        "metric": "mygan_eval_sweep_ms_per_batch",
        "batch": BATCH,
        "ms_uncached": round(ms_uncached, 2),
        "ms_cached": round(ms_cached, 2),
        "cached_speedup": round(ms_uncached / ms_cached, 3),
    }))


if __name__ == "__main__":
    main()
