#!/usr/bin/env python
"""Capture a device trace of the fused MyGAN train step and print the
top ops by self time.

Usage: python tools/profile_step.py [--steps 3] [--out /tmp/vfd_trace]
Parses the xplane proto produced by jax.profiler into an op-level table
(no TensorBoard needed).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--model", default="mygan",
                    help="any bench.py family: mygan/c2plus1d/xception/"
                         "clstm/anogan/ganomaly")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    out = args.out or tempfile.mkdtemp(prefix="vfd_trace_")

    import jax
    import jax.numpy as jnp

    import bench
    from vfd_gan_tpu.config import Config
    from vfd_gan_tpu.ops.augment import staging_size
    from vfd_gan_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    tmp = tempfile.mkdtemp(prefix="profstep_")
    b = args.batch
    cfg = Config(model=args.model, isize=128, nfr=16, batchsize=b, ngf=32,
                 ndf=32, ep=1, freq=10 ** 9, compute_dtype="bfloat16",
                 tensorboard=False, result_root=tmp).validate()
    engine, carry, step = bench._build_engine(cfg)
    s = staging_size(128)

    @jax.jit
    def make_batch(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "data": jax.random.randint(k1, (b, 16, s, s, 3), 0, 255,
                                       jnp.uint8),
            "real": jax.random.randint(k2, (b, 16, s, s, 3), 0, 255,
                                       jnp.uint8),
            "mask": (jax.random.randint(k3, (b, 16, s, s, 1), 0, 2,
                                        jnp.uint8) * 255).astype(jnp.uint8),
            "label": jnp.ones((b, 16), jnp.float32),
        }

    batch = make_batch(jax.random.key(1))
    key = jax.random.key(0)
    carry, scalar = step(carry, batch, key)
    float(scalar)                             # warm/compile

    jax.profiler.start_trace(out)
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        carry, scalar = step(carry, batch, sub)
    float(scalar)
    jax.profiler.stop_trace()
    print(f"trace written to {out}", flush=True)

    summarize(out, args.top, args.steps)


def _varint(buf, i):
    x = 0
    sh = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << sh
        if not b & 0x80:
            return x, i
        sh += 7


def _fields(buf):
    """Generic protobuf wire-format field iterator."""
    i = 0
    while i < len(buf):
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
            yield fn, v
        elif wt == 2:
            ln, i = _varint(buf, i)
            yield fn, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield fn, buf[i:i + 4]
            i += 4
        elif wt == 1:
            yield fn, buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")


def op_times(out: str, line_filter: str = "XLA Ops"):
    """{op_name: total_ms} over all traced steps (see summarize docstring
    for the wire-format layout)."""
    total, _count = _aggregate(out, line_filter)
    return dict(total)


def summarize(out: str, top: int, steps: int, line_filter: str = "XLA Ops"):
    """Aggregate XLA op self-times from the xplane proto.

    Parses the wire format directly (no xplane_pb2 in this image):
    XSpace.planes=1; XPlane{name=2, lines=3, event_metadata=4};
    XLine{name=2, events=4}; XEvent{metadata_id=1, duration_ps=3};
    map entry{key=1, value=2}; XEventMetadata{id=1, name=2}.
    """
    total, count = _aggregate(out, line_filter)
    if total is None:
        print("no xplane.pb found; inspect the trace dir manually")
        return
    print(f"\ntop {top} '{line_filter}' ops by total device time "
          f"({steps} steps):")
    for nm, ms in total.most_common(top):
        print(f"{ms / steps:9.3f} ms/step x{count[nm] // steps:<4d} {nm[:100]}")
    print(f"total: {sum(total.values()) / steps:.1f} ms/step over "
          f"{sum(count.values())} events")


def _aggregate(out: str, line_filter: str = "XLA Ops"):
    import collections

    paths = glob.glob(os.path.join(out, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        return None, None
    data = open(paths[0], "rb").read()
    total = collections.Counter()
    count = collections.Counter()
    for fn, plane in _fields(data):
        if fn != 1:
            continue
        name = None
        lines = []
        meta = {}
        for fn2, v2 in _fields(plane):
            if fn2 == 2:
                name = v2
            elif fn2 == 3:
                lines.append(v2)
            elif fn2 == 4:                      # map<int64, XEventMetadata>
                k = None
                m = None
                for fn3, v3 in _fields(v2):
                    if fn3 == 1:
                        k = v3
                    elif fn3 == 2:
                        m = v3
                if m is not None:
                    nm = ""
                    for fn4, v4 in _fields(m):
                        if fn4 == 2:
                            nm = v4.decode("utf-8", "replace")
                    meta[k] = nm
        if name != b"/device:TPU:0":
            continue
        for ln in lines:
            lname = b""
            evs = []
            for fn3, v3 in _fields(ln):
                if fn3 == 2:
                    lname = v3
                elif fn3 == 4:
                    evs.append(v3)
            if lname.decode("utf-8", "replace") != line_filter:
                continue
            for ev in evs:
                mid = dur = 0
                for fn4, v4 in _fields(ev):
                    if fn4 == 1:
                        mid = v4
                    elif fn4 == 3:
                        dur = v4
                total[meta.get(mid, str(mid))] += dur / 1e9   # ps -> ms
                count[meta.get(mid, str(mid))] += 1
    return total, count


if __name__ == "__main__":
    main()
