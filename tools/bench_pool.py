#!/usr/bin/env python
"""Micro-bench: block avg-pool formulations on the TPU.

The round-3 device trace shows the discriminators' AvgPool3d lowerings
(ops/convs.avg_pool3d reshape-mean path) costing ~4 ms/step at b4: the
H->(H/2,2), W->(W/2,2) reshape forces a transposed layout ({6,1,5,4,3,2,0})
that XLA satisfies with a full f32 copy of the (4,16,128,128,32) activation
before a separate reduce stage (HLO: %copy.2731/%copy.2766 + %reduce.991).

Candidates (protocol: reps inside ONE jitted lax.scan, full-output carry,
interleaved min-of-rounds — BENCH_NOTES.md round-3 recalibration):

* reshape_mean — current production path.
* slice_add    — strided-slice the window phases and add them elementwise
                 (f32 accumulate, cast back); layout-preserving, fuses.
* reduce_window— lax.reduce_window add in input dtype / 4 (TPU pooling
                 emitter).

Usage: python tools/bench_pool.py [--what fwd|fwdbwd] [--reps 300]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from vfd_gan_tpu.utils.runtime import enable_compilation_cache

# (name, (B, T, H, W, C), window): the fused step's discriminator pools
# (mygannet.py:41,132-133,174-175), heaviest first.
SHAPES = [
    ("sdisc_l1", (4, 16, 128, 128, 32), (1, 2, 2)),
    ("tdisc_l1", (4, 16, 128, 128, 32), (2, 2, 2)),
    ("sdisc_l2", (4, 16, 64, 64, 64), (1, 2, 2)),
    ("tdisc_l2", (4, 8, 64, 64, 64), (2, 2, 2)),
]


def pool_reshape_mean(x, window):
    b, t, h, w, c = x.shape
    wt, wh, ww = window
    y = x.reshape(b, t // wt, wt, h // wh, wh, w // ww, ww, c)
    return y.mean(axis=(2, 4, 6))


def pool_slice_add(x, window):
    wt, wh, ww = window
    acc = None
    for dt in range(wt):
        for dh in range(wh):
            for dw in range(ww):
                sl = x[:, dt::wt, dh::wh, dw::ww, :].astype(jnp.float32)
                acc = sl if acc is None else acc + sl
    return (acc * (1.0 / (wt * wh * ww))).astype(x.dtype)


def pool_reduce_window(x, window):
    dims = (1, *window, 1)
    summed = lax.reduce_window(x, jnp.zeros((), x.dtype), lax.add, dims,
                               dims, "VALID")
    n = window[0] * window[1] * window[2]
    return summed * jnp.asarray(1.0 / n, x.dtype)


def _rw_vjp_make():
    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
    def pool(x, window):
        return pool_reduce_window(x, window)

    def fwd(x, window):
        return pool(x, window), x.shape

    def bwd(window, shape, g):
        b, t, h, w, c = shape
        wt, wh, ww = window
        n = wt * wh * ww
        gs = (g * jnp.asarray(1.0 / n, g.dtype))[
            :, :, None, :, None, :, None, :]
        gb = jnp.broadcast_to(gs, (b, t // wt, wt, h // wh, wh, w // ww,
                                   ww, c))
        return (gb.reshape(shape),)

    pool.defvjp(fwd, bwd)
    return pool


FORMS = {"reshape_mean": pool_reshape_mean, "slice_add": pool_slice_add,
         "reduce_window": pool_reduce_window,
         "rw_customvjp": _rw_vjp_make()}


def build_timer(f, shape, window, what, reps):
    def run(key):
        x = jax.random.normal(key, shape, jnp.bfloat16)

        def body(carry, r):
            xr = x + (carry * 1e-30).astype(x.dtype)
            if what == "fwd":
                acc = jnp.sum(f(xr, window).astype(jnp.float32))
            else:
                # squared loss: the pool is linear, so a plain sum-loss has
                # a CONSTANT input gradient and XLA folds the whole pass
                # away (measured 0.08 ms "fwdbwd" — the round-3 DCE trap)
                def loss(xx):
                    return jnp.sum(f(xx, window).astype(jnp.float32) ** 2)
                acc = jnp.sum(jax.grad(loss)(xr).astype(jnp.float32))
            return carry + acc, None

        s, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return s

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="fwd", choices=["fwd", "fwdbwd"])
    ap.add_argument("--reps", type=int, default=300)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--forms", default="reshape_mean,slice_add,reduce_window")
    args = ap.parse_args()

    enable_compilation_cache()
    forms = args.forms.split(",")
    key = jax.random.key(0)

    for name, shape, window in SHAPES:
        gb = 2 * (1 + 1 / (window[0] * window[1] * window[2])) \
            * int(jnp.prod(jnp.asarray(shape))) * 2 / 1e9  # bf16 r+w bytes
        timers = {fm: build_timer(FORMS[fm], shape, window, args.what,
                                  args.reps) for fm in forms}
        for fm in forms:
            float(timers[fm](key))
        times = {fm: [] for fm in forms}
        for _ in range(args.rounds):
            for fm in forms:
                t0 = time.perf_counter()
                float(timers[fm](key))
                times[fm].append((time.perf_counter() - t0) / args.reps)
        line = f"{name} {shape} win{window} (~{gb:.2f} GB moved fwd):"
        for fm in forms:
            ms = min(times[fm]) * 1e3
            line += f"  {fm}={ms:.3f}ms"
        print(line, flush=True)


if __name__ == "__main__":
    main()
