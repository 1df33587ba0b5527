#!/usr/bin/env python
"""Probe: per-op cost inside the scan harness — bare GEMM, pad+concat,
elementwise — to locate where the im2col formulation's time goes."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from vfd_gan_tpu.utils.runtime import enable_compilation_cache

REPS = int(os.environ.get("REPS", 200))


def timeit(make_inputs, op, label):
    def run(key):
        ins = make_inputs(key)

        def body(carry, r):
            scale = (1.0 + 1e-6 * r.astype(jnp.bfloat16))
            y = op(*[a * scale if i == 0 else a for i, a in enumerate(ins)])
            return carry + jnp.sum(y[..., :1].astype(jnp.float32)), None

        s, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(REPS))
        return s

    f = jax.jit(run)
    key = jax.random.key(0)
    float(f(key))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(key))
        ts.append((time.perf_counter() - t0) / REPS)
    print(f"{label}: {statistics.median(ts) * 1e3:.3f} ms", flush=True)


def main():
    enable_compilation_cache()
    key = jax.random.key(0)

    # disc4 im2col pieces: x (64,4,4,512) -> A (64,4,4,4608) -> GEMM 837
    timeit(lambda k: (jax.random.normal(k, (1024, 4608), jnp.bfloat16),
                      jax.random.normal(k, (4608, 837), jnp.bfloat16)),
           lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
           "bare GEMM (1024,4608)@(4608,837)")

    def concat9(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jnp.concatenate(
            [xp[:, dh:dh + 4, dw:dw + 4] for dh in range(3)
             for dw in range(3)], axis=-1)

    timeit(lambda k: (jax.random.normal(k, (64, 4, 4, 512), jnp.bfloat16),),
           concat9, "pad+concat9 (64,4,4,512)->(64,4,4,4608)")

    timeit(lambda k: (jax.random.normal(k, (64, 4, 4, 512), jnp.bfloat16),),
           lambda x: x * 2.0 + 1.0, "elementwise (64,4,4,512)")

    timeit(lambda k: (jax.random.normal(k, (8, 128), jnp.bfloat16),),
           lambda x: x * 2.0 + 1.0, "elementwise (8,128) [floor probe]")

    # uconv1 equivalents
    timeit(lambda k: (jax.random.normal(k, (64 * 128 * 128, 96),
                                        jnp.bfloat16),
                      jax.random.normal(k, (96, 86), jnp.bfloat16)),
           lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
           "bare GEMM (1Mx96)@(96,86) [uconv1 1-tap]")


if __name__ == "__main__":
    main()
