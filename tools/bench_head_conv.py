#!/usr/bin/env python
"""Micro-bench: small-Cout 3-D "head" conv formulations on the TPU.

The round-3 trace shows the generator's (3,3,3,32,1) head conv
(models/mygan.py:85, reference mygannet.py:204-205) costing ~5.3 ms/step
fwd+bwd through XLA's conv emitter: Cout=1 leaves the MXU lane dim 1/128
occupied ("EmitOutputBatchInLanesInputBatchInSublanes"), plus a 0.94 ms
layout copy and a 1.62 ms filter-grad pass — ~300x off roofline for a
1.8 GFLOP op.

Candidates (scan protocol, squared loss — the conv is linear in x, a
plain sum loss DCEs the backward):

* xla      — lax.conv_general_dilated (current conv3d).
* tap_gemm — ONE channel GEMM ``x @ K2`` with the 27 taps (x Cout) in the
             lane dim, then a sum of 27 shifted slices:
             ``y[b,t,h,w,o] = sum_j P[b,t+1-dt_j,h+1-dh_j,w+1-dw_j,(j,o)]``.
* im2col   — 27-shift concat -> (N*T*H*W, 27C) @ (27C, Cout).

Usage: python tools/bench_head_conv.py [--what fwd|fwdbwd] [--reps 200]
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

# (name, (B, T, H, W, Cin), Cout): the model zoo's 3x3x3 head convs.
SHAPES = [
    ("mygan_head", (4, 16, 128, 128, 32), 1),
    ("stcnn_head", (4, 16, 128, 128, 16), 1),
]


def conv_xla(x, k):
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv_tap_gemm(x, k):
    b, t, h, w, c = x.shape
    kt, kh, kw, _, cout = k.shape
    # K2[c, (dt, dh, dw, o)]: taps+Cout in the GEMM lane dim.
    k2 = jnp.transpose(k, (3, 0, 1, 2, 4)).reshape(c, kt * kh * kw * cout)
    p = jnp.einsum("bthwc,cm->bthwm", x, k2.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    pp = jnp.pad(p, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = None
    j = 0
    for dt in range(kt):
        for dh in range(kh):
            for dw in range(kw):
                sl = pp[:, dt:dt + t, dh:dh + h, dw:dw + w,
                        j * cout:(j + 1) * cout]
                out = sl if out is None else out + sl
                j += 1
    return out


def conv_im2col(x, k):
    b, t, h, w, c = x.shape
    kt, kh, kw, _, cout = k.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    a = jnp.concatenate(
        [xp[:, dt:dt + t, dh:dh + h, dw:dw + w]
         for dt in range(kt) for dh in range(kh) for dw in range(kw)],
        axis=-1)
    out = jnp.einsum("bthwk,kd->bthwd", a,
                     k.reshape(kt * kh * kw * c, cout).astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


FORMS = {"xla": conv_xla, "tap_gemm": conv_tap_gemm, "im2col": conv_im2col}


def build_timer(f, shape, cout, what, reps):
    def run(key):
        kx, kk = jax.random.split(key)
        x = jax.random.normal(kx, shape, jnp.bfloat16)
        kern = jax.random.normal(
            kk, (3, 3, 3, shape[-1], cout), jnp.bfloat16) * 0.05

        def body(carry, r):
            kr = kern + (carry * 1e-30).astype(kern.dtype)
            if what == "fwd":
                acc = jnp.sum(f(x, kr).astype(jnp.float32))
            else:
                def loss(xx, kk_):
                    return jnp.sum(f(xx, kk_).astype(jnp.float32) ** 2)
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
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--forms", default="xla,tap_gemm,im2col")
    args = ap.parse_args()

    enable_compilation_cache()
    forms = args.forms.split(",")
    key = jax.random.key(0)

    for name, shape, cout in SHAPES:
        b, t, h, w, c = shape
        gflop = 2 * b * t * h * w * 27 * c * cout / 1e9
        timers = {fm: build_timer(FORMS[fm], shape, cout, args.what,
                                  args.reps) for fm in forms}
        for fm in forms:
            float(timers[fm](key))
        times = {fm: [] for fm in forms}
        for _ in range(args.rounds):
            for fm in forms:
                t0 = time.perf_counter()
                float(timers[fm](key))
                times[fm].append((time.perf_counter() - t0) / args.reps)
        line = f"{name} {shape}->{cout} ({gflop:.1f} GF fwd):"
        for fm in forms:
            ms = min(times[fm]) * 1e3
            line += f"  {fm}={ms:.3f}ms"
        print(line, flush=True)


if __name__ == "__main__":
    main()
