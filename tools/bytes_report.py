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
_SHAPE_LAYOUT_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\](\{[^{}]*\})?")

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


def shape_hbm_bytes(spec: str) -> int:
    """Like shape_bytes, but counts only subshapes that live in the
    DEFAULT memory space.  Post-optimization layouts carry ``S(n)``
    space annotations — ``S(1)`` buffers are VMEM/scoped (ConvLSTM's
    whole scan stack lives there; the HBM side of each transfer is
    charged at its async copy-start instead), and host-space buffers
    move over PCIe, not HBM.  Charging S(1) outputs as HBM writes made
    the clstm measured-time MBU read an impossible 1.3-1.6."""
    total = 0
    for dtype, dims, layout in _SHAPE_LAYOUT_RE.findall(spec):
        if dtype not in DTYPE_BYTES:
            continue
        if layout and re.search(r"S\(\d+\)", layout):
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
        # om indexes into " " + after: subtract the sentinel space so the
        # slice starts right after "(" (off-by-one here ate the leading
        # "%" of every instruction's FIRST operand and silently dropped
        # it from the read model — found round 5 via the clstm slice
        # audit; mygan's modelled total moved 84.95 -> see BENCH_NOTES).
        shape = after[:om.start()]          # everything before the opcode
        opcode = om.group(1)
        rest = after[om.end() - 1:]
        yield name, shape, opcode, rest


_COMP_HEAD_RE = re.compile(r"^%([\w.\-]+) \(")
_PARAM_RE = re.compile(r"^\s*%?([\w.\-]+)\s*=\s*(.*?)\sparameter\((\d+)\)")


def _fusion_param_reads(hlo_text: str):
    """Per-computation, per-parameter-index HBM read extents.

    A fusion operand is NOT fully read when the fused computation only
    slices it: ConvLSTM's unrolled per-timestep fusions each take the
    whole (B,T,H,W,C) video as an operand but slice ONE frame inside —
    charging the full operand 16x overcounted the family's traffic by
    >2x (measured-time MBU read an impossible 1.34).  For a parameter
    whose every use is a ``slice``/``dynamic-slice``, charge the sum of
    the slice outputs (each materialised read is real traffic), capped
    at the full operand size; any other use charges the full operand.

    A fusion whose ROOT is a ``dynamic-update-slice`` of a parameter
    (resolved through bitcasts) writes only the update region — XLA
    aliases the target buffer in place — and never reads the target's
    full extent; charging a full write overcounted ConvLSTM's 15
    scan-stack DUS fusions by ~0.5 GB each.

    Returns {computation_name: ({param_index: read_bytes},
    dus_info|None)} where dus_info = (target_param_index, update_bytes);
    the read dict contains only parameters with a reduced extent.
    """
    comps: dict[str, tuple[dict[int, int], tuple[int, int] | None]] = {}
    cur = None          # (comp_name, {param_name: (idx, full_bytes)})
    param_uses: dict[str, list[tuple[str, int]]] = {}
    alias: dict[str, str] = {}      # bitcast/reshape name -> source name
    out_sizes: dict[str, int] = {}
    root: tuple[str, list[str], int] | None = None
    lines = hlo_text.splitlines()
    for ln in lines:
        m = _COMP_HEAD_RE.match(ln)
        if m and not ln.startswith("ENTRY"):
            cur = (m.group(1), {})
            param_uses, alias, out_sizes, root = {}, {}, {}, None
            continue
        if cur is None:
            continue
        if ln.startswith("}") or ln.strip() == "}":
            reduced = {}
            for pname, (idx, full) in cur[1].items():
                uses = param_uses.get(pname, [])
                if uses and all(op in ("slice", "dynamic-slice")
                                for op, _ in uses):
                    reduced[idx] = min(sum(b for _, b in uses), full)
            dus = None
            if root and root[0] == "dynamic-update-slice" and root[1]:
                tgt = root[1][0]
                while tgt in alias:
                    tgt = alias[tgt]
                if tgt in cur[1]:
                    upd = (out_sizes.get(root[1][1], 0)
                           if len(root[1]) > 1 else 0)
                    # the in-place target is neither fully read nor
                    # fully written; the update operand itself is still
                    # charged as a normal read
                    dus = (cur[1][tgt][0], upd)
            if reduced or dus:
                comps[cur[0]] = (reduced, dus)
            cur = None
            continue
        pm = _PARAM_RE.match(ln)
        if pm:
            cur[1][pm.group(1)] = (int(pm.group(3)),
                                   shape_bytes(pm.group(2)))
            out_sizes[pm.group(1)] = shape_bytes(pm.group(2))
            continue
        nm = _NAME_RE.match(ln)
        if not nm:
            continue
        name = nm.group(1)
        after = ln[nm.end():]
        om = _OPCODE_RE.search(" " + after)
        if not om:
            continue
        out_b = shape_bytes(after[:om.start()])
        opcode = om.group(1)
        out_sizes[name] = out_b
        refs = re.findall(r"%([\w.\-]+)", after[om.end() - 1:])
        if opcode in ("bitcast", "reshape", "copy") and refs:
            alias[name] = refs[0]
        for ref in refs:
            if ref in cur[1]:
                param_uses.setdefault(ref, []).append((opcode, out_b))
        if "ROOT" in ln[:8 + len(name)] or ln.lstrip().startswith("ROOT"):
            root = (opcode, refs, out_b)
    return comps


_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")


def build_table(hlo_text: str):
    """Per-instruction modelled HBM bytes for the entry computation.

    Operand resolution is two-pass: %refs in an instruction's tail are
    counted as data operands only when they name another entry-computation
    instruction (refs to fused computations / regions resolve to nothing).
    Fusion operands that are only *sliced* inside the fused computation are
    charged at their sliced extent (see _fusion_param_reads)."""
    instrs = list(parse_entry(hlo_text))
    out_bytes = {name: shape_hbm_bytes(shape)
                 for name, shape, _, _ in instrs}
    sliced = _fusion_param_reads(hlo_text)
    rows = []
    for name, shape, opcode, rest in instrs:
        if opcode in _FREE_OPS:
            continue
        write = out_bytes.get(name, 0)
        operands = [o for o in re.findall(r"%([\w.\-]+)", rest)
                    if o in out_bytes]
        reduced, dus = {}, None
        if opcode == "fusion":
            cm = _CALLS_RE.search(rest)
            if cm and cm.group(1) in sliced:
                reduced, dus = sliced[cm.group(1)]
        elif opcode == "dynamic-update-slice" and len(operands) > 1:
            # in-place: writes the update region only, never reads the
            # full target (the buffer is aliased)
            dus = (0, out_bytes.get(operands[1], 0))
        if dus is not None:
            write = min(dus[1], write)
            reduced = dict(reduced)
            reduced[dus[0]] = 0
        read = sum(reduced.get(i, out_bytes.get(o, 0))
                   for i, o in enumerate(operands))
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
