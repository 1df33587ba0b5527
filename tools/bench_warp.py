#!/usr/bin/env python
"""Micro-bench: Pallas bilinear-warp kernel variants on the TPU.

Shapes are the fused step's Farneback pyramid levels at the reference
workload (b4 x T16 x 128^2, two streams -> N=120 field stacks, C=5 poly
coefficients).  Protocol per BENCH_NOTES.md round-3 recalibration: reps
inside ONE jitted lax.scan, carry consumes the FULL output, operand
perturbed by the carry (unhoistable), min over interleaved rounds.

Usage: python tools/bench_warp.py [--reps 200] [--forms v2,v3]
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

from vfd_gan_tpu.ops.pallas.warp import bilinear_warp_pallas
from vfd_gan_tpu.utils.runtime import enable_compilation_cache

SHAPES = [  # (name, N, H, W, C)
    ("lvl0-128", 120, 128, 128, 5),
    ("lvl1-64", 120, 64, 64, 5),
    ("lvl2-32", 120, 32, 32, 5),
]


def build_timer(variant, shape, reps):
    name, n, h, w, c = shape

    def run(key):
        kf, kx, ky = jax.random.split(key, 3)
        fields = jax.random.normal(kf, (n, h, w, c), jnp.float32)
        fx = jax.random.normal(kx, (n, h, w), jnp.float32) * 5.0
        fy = jax.random.normal(ky, (n, h, w), jnp.float32) * 5.0

        def body(carry, r):
            f = fields + (carry * 1e-30)
            y = bilinear_warp_pallas(f, fx, fy, variant=variant)
            return carry + jnp.sum(y), None

        s, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return s

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--forms", default="v3,v5")
    ap.add_argument("--shapes", default="")
    args = ap.parse_args()

    enable_compilation_cache()
    forms = args.forms.split(",")
    shapes = [s for s in SHAPES
              if not args.shapes or s[0] in args.shapes.split(",")]
    key = jax.random.key(0)

    for shape in shapes:
        name, n, h, w, c = shape
        # MXU bound of the one-hot formulation: H*W MACs per output
        # position per channel (horizontal matmul dominates).
        gflop = 2 * n * h * w * c * (h * w) / 1e9
        timers = {fm: build_timer(fm, shape, args.reps) for fm in forms}
        for fm in forms:
            float(timers[fm](key))               # warm/compile
        times = {fm: [] for fm in forms}
        for _ in range(args.rounds):
            for fm in forms:
                t0 = time.perf_counter()
                float(timers[fm](key))
                times[fm].append((time.perf_counter() - t0) / args.reps)
        line = f"{name} (N={n} {h}x{w}x{c}, {gflop:.0f} GF 1-hot):"
        for fm in forms:
            ms = min(times[fm]) * 1e3
            line += f"  {fm}={ms:.2f}ms({gflop / ms:.0f} GF/ms-equiv)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
