#!/usr/bin/env python
"""Micro-bench: 3x3 stride-1 SAME spatial conv formulations on the TPU.

Times each formulation at the fused-step's census shapes
(tools/census_spatial_conv.py) with the measurement protocol from
BENCH_NOTES.md: R reps inside ONE jitted lax.scan (amortises the ~3 ms
tunnel dispatch floor), scalar fetch to sync, interleaved median-of-3
across formulations.

Usage: python tools/bench_spatial_conv.py [--what fwd|fwdbwd] [--reps 20]
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from vfd_gan_tpu.utils.runtime import enable_compilation_cache

# (N, H, W, Cin, Cout): per-frame views of the census's 3x3 stride-1 convs,
# heaviest first.  The tiny-spatial disc shapes are included to see whether
# XLA's emitter is off-roofline there too.
SHAPES = [
    ("uconv1", 64, 128, 128, 96, 86),
    ("uconv2", 32, 64, 64, 192, 172),
    ("uconv3", 16, 32, 32, 384, 345),
    ("disc64", 64, 64, 64, 32, 52),
    ("disc16", 64, 16, 16, 128, 209),
    ("disc4", 64, 4, 4, 512, 837),
]


def conv_xla(x, k):
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_wide_gemm(x, k):
    """W-axis im2col concat -> ONE wide GEMM -> H-shift-sum.

    A[n,y,w,dw*C+c] = xp[n,y,w+dw,c]; Wwide[(dw,c),(dh,d)] = k[dh,dw,c,d];
    out[n,y,w,d] = sum_dh B[n,y+dh,w,dh*D+d].
    """
    n, h, w, c = x.shape
    d = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    a = jnp.concatenate([xp[:, :, i:i + w] for i in range(3)], axis=-1)
    wwide = jnp.transpose(k, (1, 2, 0, 3)).reshape(3 * c, 3 * d)
    bw = jnp.einsum("nhwk,km->nhwm", a, wwide,
                    preferred_element_type=jnp.float32)
    out = (bw[:, 0:h, :, 0:d] + bw[:, 1:h + 1, :, d:2 * d]
           + bw[:, 2:h + 2, :, 2 * d:3 * d])
    return out.astype(x.dtype)


def conv_im2col(x, k):
    """Full im2col -> ONE GEMM: (N*H*W, 9C) @ (9C, D).

    Pays the 9x input materialisation; wins when H*W is small enough that
    XLA's per-frame window emitter is the bottleneck (tiny-spatial disc
    convs run at 1-2% of peak through lax.conv).
    """
    n, h, w, c = x.shape
    d = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    a = jnp.concatenate(
        [xp[:, dh:dh + h, dw:dw + w] for dh in range(3) for dw in range(3)],
        axis=-1)                                   # (N, H, W, 9C)
    out = jnp.einsum("nhwk,kd->nhwd", a.reshape(n, h, w, 9 * c),
                     k.reshape(9 * c, d), preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


FORMS = {"xla": conv_xla, "wide_gemm": conv_wide_gemm,
         "im2col": conv_im2col}


def build_timer(f, shape, what, reps):
    name, n, h, w, cin, cout = shape

    def run(key):
        kx, kk = jax.random.split(key)
        x = jax.random.normal(kx, (n, h, w, cin), jnp.bfloat16)
        kern = jax.random.normal(kk, (3, 3, cin, cout), jnp.bfloat16) * 0.05

        def body(carry, r):
            # data-dependent kernel perturbation: symbolically unhoistable
            # (depends on the running carry), numerically adds ~1e-25 -> 0
            kr = kern + (carry * 1e-30).astype(kern.dtype)
            # NOTE: reductions must cover the FULL arrays — a sliced
            # reduce lets XLA dead-code-eliminate the unused output
            # channels of the conv/GEMM (measured: a 4096^3 GEMM "ran" at
            # 7.5x physical peak with a y[0,0] carry).
            if what == "fwd":
                y = f(x, kr)
                acc = jnp.sum(y.astype(jnp.float32))
            else:
                def loss(xx, kk_):
                    return jnp.sum(f(xx, kk_).astype(jnp.float32))
                dx, dk = jax.grad(loss, argnums=(0, 1))(x, kr)
                acc = (jnp.sum(dx.astype(jnp.float32))
                       + jnp.sum(dk.astype(jnp.float32)))
            return carry + acc, None

        s, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return s

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="fwd", choices=["fwd", "fwdbwd"])
    ap.add_argument("--reps", type=int, default=1000)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--forms", default="xla,wide_gemm")
    ap.add_argument("--shapes", default="")
    args = ap.parse_args()

    enable_compilation_cache()
    forms = args.forms.split(",")
    shapes = [s for s in SHAPES
              if not args.shapes or s[0] in args.shapes.split(",")]
    key = jax.random.key(0)

    def floor_run(k):
        x = jax.random.normal(k, (8, 128), jnp.bfloat16)
        def body(c, r):
            y = x + (c * 1e-30).astype(x.dtype)
            return c + jnp.sum(y.astype(jnp.float32)), None
        s, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(args.reps))
        return s
    fj = jax.jit(floor_run)
    float(fj(key))
    fl = []
    for _ in range(3):
        t0 = time.perf_counter(); float(fj(key))
        fl.append((time.perf_counter() - t0) / args.reps)
    floor = statistics.median(fl)
    print(f"per-rep harness floor: {floor*1e3:.3f} ms", flush=True)

    for shape in shapes:
        name, n, h, w, cin, cout = shape
        gflop = 2 * n * h * w * 9 * cin * cout / 1e9
        timers = {fm: build_timer(FORMS[fm], shape, args.what, args.reps)
                  for fm in forms}
        for fm in forms:                       # warm/compile
            float(timers[fm](key))
        times = {fm: [] for fm in forms}
        for _ in range(args.rounds):           # interleaved rounds
            for fm in forms:
                t0 = time.perf_counter()
                float(timers[fm](key))
                times[fm].append((time.perf_counter() - t0) / args.reps)
        line = f"{name} ({n}x{h}x{w} {cin}->{cout}, {gflop:.0f} GF fwd):"
        for fm in forms:
            ms = min(times[fm]) * 1e3
            eff = gflop / (ms / 1e3) / 197e3 * (1 if args.what == "fwd"
                                                else 3)
            line += f"  {fm}={ms:.2f}ms({eff * 100:.0f}%pk)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
