#!/usr/bin/env python
"""Micro-bench: Pallas one-hot-matmul augment gather vs the XLA gather.

Reference workload shape: b4 x T16 staged at S=140 -> isize 128, joint
(data, real, mask) = 7 channels.  Protocol per BENCH_NOTES.md round-3
recalibration: reps inside ONE jitted lax.scan, per-rep key fold-in (body
is not loop-invariant), carry consumes the full outputs, min over
interleaved rounds.

Usage: python tools/bench_augment.py [--reps 100] [--batch 4]
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

from vfd_gan_tpu.ops.augment import augment_clips, staging_size
from vfd_gan_tpu.utils.runtime import enable_compilation_cache


def build_timer(use_pallas, b, t, isize, reps):
    s = staging_size(isize)

    def run(key):
        kd, kr, km = jax.random.split(key, 3)
        data = jax.random.randint(kd, (b, t, s, s, 3), 0, 256, jnp.uint8)
        real = jax.random.randint(kr, (b, t, s, s, 3), 0, 256, jnp.uint8)
        mask = jax.random.randint(km, (b, t, s, s, 1), 0, 256, jnp.uint8)

        def body(carry, r):
            k = jax.random.fold_in(key, r)
            d, rr, m = augment_clips(k, data, real, mask, isize,
                                     use_pallas=use_pallas)
            return carry + jnp.sum(d) + jnp.sum(rr) + jnp.sum(m), None

        out, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return out

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--isize", type=int, default=128)
    args = ap.parse_args()

    enable_compilation_cache()
    key = jax.random.key(0)
    arms = {"xla-gather": build_timer(False, args.batch, args.frames,
                                      args.isize, args.reps),
            "pallas-1hot": build_timer(True, args.batch, args.frames,
                                       args.isize, args.reps)}
    for name, fn in arms.items():
        float(fn(key))                                   # warm/compile
    times = {name: [] for name in arms}
    for _ in range(args.rounds):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            float(fn(key))
            times[name].append((time.perf_counter() - t0) / args.reps)
    s = staging_size(args.isize)
    planes = args.batch * args.frames * 7
    gflop = 2 * planes * s * s * args.isize * args.isize / 1e9
    line = (f"b{args.batch} T{args.frames} S{s}->{args.isize} "
            f"({planes} planes, {gflop:.0f} GF 1-hot):")
    for name in arms:
        ms = min(times[name]) * 1e3
        line += f"  {name}={ms:.2f}ms"
    print(line, flush=True)


if __name__ == "__main__":
    main()
