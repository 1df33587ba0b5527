#!/usr/bin/env python
"""Itemize HBM traffic of a compiled train step, per HLO instruction.

VERDICT r4 items 2+6: the whole-module ``cost_analysis()['bytes accessed']``
behind bench.py's MBU is an *aggregate* (and a known overcount for unrolled
code / undercount for rolled scans).  This tool parses the
POST-OPTIMIZATION HLO of the compiled step and models HBM traffic at the
instruction boundary, where it is physically real on TPU:

  * every top-level instruction in the entry computation reads its operands
    from HBM and writes its result to HBM (fusion-internal values live in
    VMEM and are free);
  * ``parameter`` / ``constant`` / ``tuple`` / ``get-tuple-element`` /
    ``bitcast`` produce no data movement themselves (parameters are read
    when consumed; bitcasts are free relabels);
  * traffic per instruction = sum(operand sizes) + output size.

Prints the top-N byte movers (the prerequisite for attacking the
116.8 GB/step), per-category totals, and the model total next to XLA's
``cost_analysis`` number.  With ``--trace`` it also captures a device
trace and joins measured per-op times -> achieved GB/s per op and a
MEASURED-time/modelled-bytes MBU to place beside the analytic one.

Usage: python tools/bytes_report.py [--model mygan] [--batch 8] [--top 25]
       [--trace] [--remat] [--flow_scale 0.5]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {
    "pred": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
    "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
    "f64": 8, "c64": 8, "c128": 16, "f8e4m3fn": 1, "f8e5m2": 1,
    "f8e4m3b11fnuz": 1, "f8e4m3fnuz": 1, "f8e5m2fnuz": 1, "token": 0,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")

# ops that move no data themselves at the instruction boundary
_FREE_OPS = {"parameter", "constant", "tuple", "get-tuple-element",
             "bitcast", "after-all", "partition-id", "replica-id"}


def shape_bytes(spec: str) -> int:
    """Bytes of an HLO shape spec: 'bf16[8,16,128]{...}' or a '(tuple, ...)'.

    Layout suffixes '{...}' are ignored; scalar '[]' is 1 element."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(spec):
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


_NAME_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*")
# the opcode is the first lowercase word directly followed by '(' after the
# shape spec; layout/tiling annotations (T(8,128), S(1), (2,1)) never match
# because they are uppercase or paren-led
_OPCODE_RE = re.compile(r"\s([a-z][a-z0-9\-]*)\(")


def parse_entry(hlo_text: str):
    """Yield (name, shape_spec, opcode, rest) for every top-level
    instruction in the ENTRY computation of post-optimization HLO text."""
    lines = hlo_text.splitlines()
    in_entry = False
    depth = 0
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
            depth = ln.count("{") - ln.count("}")
            continue
        if not in_entry:
            continue
        depth += ln.count("{") - ln.count("}")
        if depth <= 0:
            break
        m = _NAME_RE.match(ln)
        if not m:
            continue
        name = m.group(1)
        after = ln[m.end():]
        om = _OPCODE_RE.search(" " + after)
        if not om:
            continue
        shape = after[:om.start()]          # everything before the opcode
        opcode = om.group(1)
        rest = after[om.end():]
        yield name, shape, opcode, rest


def build_table(hlo_text: str):
    """Per-instruction modelled HBM bytes for the entry computation.

    Operand resolution is two-pass: %refs in an instruction's tail are
    counted as data operands only when they name another entry-computation
    instruction (refs to fused computations / regions resolve to nothing)."""
    instrs = list(parse_entry(hlo_text))
    out_bytes = {name: shape_bytes(shape) for name, shape, _, _ in instrs}
    rows = []
    for name, shape, opcode, rest in instrs:
        if opcode in _FREE_OPS:
            continue
        write = out_bytes.get(name, 0)
        read = sum(out_bytes.get(o, 0)
                   for o in re.findall(r"%([\w.\-]+)", rest)
                   if o in out_bytes)
        rows.append({"name": name, "op": opcode, "read": read,
                     "write": write, "bytes": read + write})
    rows.sort(key=lambda r: -r["bytes"])
    return rows


def classify(row) -> str:
    n, op = row["name"], row["op"]
    if op in ("convolution", "dot"):
        return "conv/dot"
    if op.startswith("all-") or op in ("reduce-scatter", "collective-permute"):
        return "collective"
    if op == "copy" or "copy" in n:
        return "layout-copy"
    if op == "custom-call":
        return "custom-call(pallas)"
    if op == "fusion":
        if "reduce_window" in n or "reduce-window" in n:
            return "fusion:pool"
        return "fusion"
    if op in ("reduce-window",):
        return "pool"
    if op.startswith("while"):
        return "while-loop"
    return op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mygan")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace", action="store_true",
                    help="also capture a device trace and join measured "
                         "per-op times (achieved GB/s; measured MBU)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat_blocks", default="")
    ap.add_argument("--flow_scale", type=float, default=0.5)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--isize", type=int, default=128)
    ap.add_argument("--nfr", type=int, default=16)
    ap.add_argument("--ngf", type=int, default=32)
    ap.add_argument("--ndf", type=int, default=32)
    ap.add_argument("--dump_hlo", default="",
                    help="write the post-optimization HLO text here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from vfd_gan_tpu.config import Config
    from vfd_gan_tpu.ops.augment import staging_size
    from vfd_gan_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    tmp = tempfile.mkdtemp(prefix="bytes_")
    b = args.batch
    cfg = Config(model=args.model, isize=args.isize, nfr=args.nfr,
                 batchsize=b, ngf=args.ngf, ndf=args.ndf, ep=1,
                 freq=10 ** 9, compute_dtype="bfloat16",
                 flow_scale=args.flow_scale, remat=args.remat,
                 remat_blocks=args.remat_blocks,
                 tensorboard=False, result_root=tmp).validate()
    engine, carry, step = bench._build_engine(cfg)
    s = staging_size(args.isize)

    t = args.nfr

    @jax.jit
    def make_batch(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "data": jax.random.randint(k1, (b, t, s, s, 3), 0, 255,
                                       jnp.uint8),
            "real": jax.random.randint(k2, (b, t, s, s, 3), 0, 255,
                                       jnp.uint8),
            "mask": (jax.random.randint(k3, (b, t, s, s, 1), 0, 2,
                                        jnp.uint8) * 255).astype(jnp.uint8),
            "label": jnp.ones((b, t), jnp.float32),
        }

    batch = make_batch(jax.random.key(1))
    lower_args = bench._step_lower_args(cfg, carry, batch, jax.random.key(0))
    compiled = engine._train_step.lower(*lower_args).compile()
    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]

    rows = build_table(hlo)
    total = sum(r["bytes"] for r in rows)
    print(f"\nmodel={cfg.model} b{b} fs{args.flow_scale} "
          f"remat={args.remat}")
    print(f"modelled HBM traffic (instruction-boundary): "
          f"{total / 1e9:.2f} GB/step")
    print(f"XLA cost_analysis 'bytes accessed':          "
          f"{cost.get('bytes accessed', 0) / 1e9:.2f} GB/step")

    cats = collections.Counter()
    for r in rows:
        cats[classify(r)] += r["bytes"]
    print("\nby category:")
    for cat, byt in cats.most_common():
        print(f"  {byt / 1e9:8.2f} GB  {100 * byt / total:5.1f}%  {cat}")

    print(f"\ntop {args.top} instructions by modelled bytes:")
    for r in rows[:args.top]:
        print(f"  {r['bytes'] / 1e9:7.3f} GB (r{r['read'] / 1e9:6.3f}/"
              f"w{r['write'] / 1e9:6.3f})  {classify(r):18s} "
              f"{r['name'][:70]}")

    if args.trace:
        trace_join(args, step, carry, batch, rows, total)


def trace_join(args, step, carry, batch, rows, total_bytes):
    import jax

    from tools.profile_step import op_times

    out = tempfile.mkdtemp(prefix="bytes_trace_")
    key = jax.random.key(0)
    carry, scalar = step(carry, batch, key)
    float(scalar)
    import time
    t0 = time.perf_counter()
    jax.profiler.start_trace(out)
    for _ in range(args.steps):
        key, sub = jax.random.split(key)
        carry, scalar = step(carry, batch, sub)
    float(scalar)
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0

    times = op_times(out)  # {op_name: total_ms}
    dev_ms = sum(times.values()) / args.steps
    by_name = {r["name"]: r for r in rows}
    print(f"\ndevice busy {dev_ms:.1f} ms/step "
          f"(wall {wall / args.steps * 1e3:.1f} ms incl. dispatch)")
    if dev_ms > 0:
        import bench
        peak_bw = bench._peak_bw(jax.devices()[0])
        if peak_bw:
            print(f"MEASURED-time MBU (modelled bytes / device-busy time / "
                  f"peak): {total_bytes / (dev_ms / 1e3) / peak_bw:.3f}")
    print("\ntop traced ops joined with modelled bytes (achieved GB/s):")
    joined = []
    for name, ms in times.items():
        ms /= args.steps
        # trace event names can be the full HLO line: '%fusion.1 = ...'
        short = name.split(" = ")[0].strip().lstrip("%")
        r = by_name.get(short)
        gbps = (r["bytes"] / 1e9) / (ms / 1e3) if r and ms > 0 else None
        joined.append((ms, short, r["bytes"] / 1e9 if r else None, gbps))
    joined.sort(reverse=True)
    for ms, name, gb, gbps in joined[:args.top]:
        gb_s = f"{gb:7.3f} GB" if gb is not None else "     (n/a)"
        bw_s = f"{gbps:7.1f} GB/s" if gbps else "            "
        print(f"  {ms:8.3f} ms  {gb_s} {bw_s}  {name[:60]}")


if __name__ == "__main__":
    main()
