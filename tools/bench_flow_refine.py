#!/usr/bin/env python
"""Micro-bench: Farneback pyramid — XLA fori_loop refinement vs the fused
Pallas warp+refine composition (ops/pallas/flow_refine.py).

Times full ``farneback_flow`` at the fused step's flow workload (b4 x T16
x 128^2, two streams -> N=120 frame pairs) with the refinement path
toggled, plus the per-level `_flow_level` in isolation.  Protocol per
BENCH_NOTES.md round-3 recalibration: reps inside ONE jitted lax.scan,
carry consumes the FULL output, operand perturbed by the carry, min over
interleaved rounds.

Usage: python tools/bench_flow_refine.py [--reps 30] [--rounds 4]
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


def build_full_timer(use_pallas: bool, n: int, hw: int, reps: int):
    from vfd_gan_tpu.ops.flow import farneback_flow

    os.environ["VFD_FLOW_REFINE"] = "1" if use_pallas else "0"

    def run(key):
        kp, kc = jax.random.split(key)
        prev = jax.random.uniform(kp, (n, hw, hw), jnp.float32) * 255.0
        cur = jnp.roll(prev, 2, axis=-1) + \
            jax.random.uniform(kc, (n, hw, hw), jnp.float32) * 5.0

        def body(carry, r):
            p = prev + (carry * 1e-30)
            y = farneback_flow(p, cur)
            return carry + jnp.sum(y), None

        s, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return s

    f = jax.jit(run)  # traces NOW under the env setting above
    f(jax.random.key(1)).block_until_ready
    return f


def build_level_timer(use_pallas: bool, n: int, hw: int, reps: int):
    from vfd_gan_tpu.ops.flow import (
        _flow_level,
        _flow_level_pallas,
        poly_expansion,
    )

    def run(key):
        kp, kf = jax.random.split(key)
        imgs = jax.random.uniform(kp, (2 * n, hw, hw), jnp.float32) * 255.0
        both = poly_expansion(imgs)
        p1, p2 = both[:n], both[n:]
        flow0 = jax.random.normal(kf, (n, hw, hw, 2), jnp.float32)

        def body(carry, r):
            q1 = p1 + (carry * 1e-30)
            if use_pallas:
                y = _flow_level_pallas(q1, p2, flow0, 15, 3)
            else:
                os.environ["VFD_FLOW_REFINE"] = "0"
                y = _flow_level(q1, p2, flow0, 15, 3)
            return carry + jnp.sum(y), None

        s, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return s

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--n", type=int, default=120)
    args = ap.parse_args()
    enable_compilation_cache()

    cases = []
    for hw in (128, 64):
        for pall in (False, True):
            cases.append((f"level-{hw} {'pallas' if pall else 'xla-fori'}",
                          build_level_timer(pall, args.n, hw, args.reps)))
    for pall in (False, True):
        cases.append((f"full-128 {'pallas' if pall else 'xla-fori'}",
                      build_full_timer(pall, args.n, 128, args.reps)))

    key = jax.random.key(0)
    for name, f in cases:
        float(f(key))                       # warm/compile
    times = {name: [] for name, _ in cases}
    for _ in range(args.rounds):
        for name, f in cases:
            t0 = time.perf_counter()
            float(f(key))
            times[name].append((time.perf_counter() - t0) / args.reps)
    for name, _ in cases:
        print(f"{name}: {min(times[name]) * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()


