#!/usr/bin/env python
"""Serving-forward A/B: f32 vs bf16 vs int8-PTQ on TPU, per family.

Protocol per BENCH_NOTES.md round-3 recalibration: reps inside ONE jitted
lax.scan, carry perturbs the operand (unhoistable) and consumes the full
output; min over interleaved rounds.

Usage: python tools/bench_quant.py [--batch 8] [--reps 50]
           [--family mygan|c2plus1d|xception]
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

from vfd_gan_tpu.models.mygan import Generator
from vfd_gan_tpu.quant.fold import fold_generator_bn
from vfd_gan_tpu.quant.qmygan import generator_forward_int8, \
    quantize_generator
from vfd_gan_tpu.utils.runtime import enable_compilation_cache

T, S = 16, 128


def build_timer(fn, operand, reps):
    def run(key):
        x = jax.random.uniform(key, operand.shape, jnp.float32, -1.0, 1.0)

        def body(carry, _):
            y = fn(x + carry * 1e-30)
            return carry + jnp.sum(y), None

        s, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return s

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--ngf", type=int, default=32)
    ap.add_argument("--family", default="mygan",
                    choices=("mygan", "c2plus1d", "xception", "clstm"))
    args = ap.parse_args()

    enable_compilation_cache()
    x = jnp.zeros((args.batch, T, S, S, 3), jnp.float32)
    calib = [jax.random.uniform(k, (1, T, S, S, 3), jnp.float32, -1.0, 1.0)
             for k in jax.random.split(jax.random.key(7), 2)]

    if args.family == "mygan":
        f32 = Generator(ngf=args.ngf, dtype=jnp.float32)
        bf16 = Generator(ngf=args.ngf, dtype=jnp.bfloat16)
        quantize, fwd_i8 = quantize_generator, generator_forward_int8
        fold = fold_generator_bn
    elif args.family == "c2plus1d":
        from vfd_gan_tpu.models.stcnn import AutoEncoder
        from vfd_gan_tpu.quant.qstcnn import (
            autoencoder_forward_int8,
            quantize_autoencoder,
        )
        f32 = AutoEncoder(dtype=jnp.float32)
        bf16 = AutoEncoder(dtype=jnp.bfloat16)
        quantize, fwd_i8, fold = (quantize_autoencoder,
                                  autoencoder_forward_int8, None)
    elif args.family == "xception":
        from vfd_gan_tpu.models.xception3d import Xception3D
        from vfd_gan_tpu.quant.qxception import (
            quantize_xception,
            xception_forward_int8,
        )
        f32 = Xception3D(dtype=jnp.float32)
        bf16 = Xception3D(dtype=jnp.bfloat16)
        quantize, fwd_i8, fold = (quantize_xception,
                                  xception_forward_int8, None)
    else:
        from vfd_gan_tpu.models.convlstm import ConvLSTMModel
        from vfd_gan_tpu.quant.qclstm import (
            convlstm_forward_int8,
            quantize_convlstm,
        )
        f32 = ConvLSTMModel(dtype=jnp.float32)
        bf16 = ConvLSTMModel(dtype=jnp.bfloat16)
        quantize, fwd_i8, fold = (quantize_convlstm,
                                  convlstm_forward_int8, None)

    variables = jax.jit(lambda k: f32.init(k, x, False))(jax.random.key(0))
    pack = quantize(variables, calib)

    forms = {
        "f32": lambda xb: f32.apply(variables, xb, False),
        "bf16": lambda xb: bf16.apply(variables, xb, False),
        "int8": lambda xb: fwd_i8(pack, xb),
    }
    if fold is not None:
        folded = fold(variables)
        forms["f32-folded"] = lambda xb: f32.apply(folded, xb, False)
    timers = {n: build_timer(fn, x, args.reps) for n, fn in forms.items()}
    key = jax.random.key(1)
    for n in forms:
        float(timers[n](key))                      # warm/compile
    times = {n: [] for n in forms}
    for _ in range(args.rounds):
        for n in forms:
            t0 = time.perf_counter()
            float(timers[n](key))
            times[n].append((time.perf_counter() - t0) / args.reps)
    for n in forms:
        ms = min(times[n]) * 1e3
        print(f"{n}: {ms:.2f} ms/fwd  "
              f"({args.batch / (ms / 1e3):.1f} clips/s)", flush=True)


if __name__ == "__main__":
    main()
