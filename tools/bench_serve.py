#!/usr/bin/env python
"""Serve-path latency A/B: bf16 vs int8 through the real HTTP endpoint.

VERDICT r4 item 8: the clstm int8-vs-bf16 recommendation in
docs/SERVING.md rested on *standalone forward* timings (BENCH_NOTES
round 6: f32 15.7 / bf16 12.2 / int8 22.3 ms per b8).  This closes the
line end-to-end: boot the actual serving stack (cli/serve.serve — model
load, optional int8 PTQ, micro-batcher, ThreadingHTTPServer), fire
concurrent clients at ``POST /predict``, and report p50/p95/p99 request
latency + throughput per leg.

Usage: python tools/bench_serve.py [--family clstm] [--legs bf16,int8]
           [--concurrency 4] [--requests 25] [--isize 128] [--nfr 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_ckpt(family: str, isize: int, nfr: int) -> str:
    """Init the family's model and park a reference-format .pth for the
    serve CLI's substring-dispatch loader (cli/infer._load)."""
    import jax

    from vfd_gan_tpu.utils.torch_export import save_pth

    if family == "clstm":
        from vfd_gan_tpu.models.convlstm import ConvLSTMModel
        model, export = ConvLSTMModel(), "clstm"
        x = np.zeros((1, nfr, isize, isize, 3), np.float32)
        variables = model.init({"params": jax.random.key(0)}, x, False)
    elif family == "c2plus1d":
        from vfd_gan_tpu.models.stcnn import AutoEncoder
        model, export = AutoEncoder(), "c2plus1d"
        x = np.zeros((1, nfr, isize, isize, 3), np.float32)
        variables = model.init({"params": jax.random.key(0)}, x, False)
    elif family == "mygan":
        from vfd_gan_tpu.models.mygan import Generator
        model, export = Generator(), "mygan_generator"
        x = np.zeros((1, nfr, isize, isize, 3), np.float32)
        variables = model.init({"params": jax.random.key(0),
                                "dropout": jax.random.key(1)}, x, False)
    else:
        raise SystemExit(f"unsupported family {family}")
    path = os.path.join(tempfile.mkdtemp(prefix="bench_serve_"),
                        # loader dispatches on substrings (test.py:115-144);
                        # 'ganbase' selects the generator family
                        {"mygan": "ganbase", "c2plus1d": "c2plus1d",
                         "clstm": "clstm"}[family] + ".pth")
    save_pth(path, jax.device_get(variables), export)
    return path


def run_leg(leg: str, ckpt: str, args, port: int):
    from vfd_gan_tpu.cli.serve import build_parser, serve

    argv = ["--ckpt", ckpt, "--torch_ckpt", "--port", str(port),
            "--isize", str(args.isize), "--nfr", str(args.nfr),
            "--max_batch", str(args.max_batch),
            "--max_wait_ms", str(args.max_wait_ms)]
    argv += (["--quant", "int8"] if leg == "int8" else
             ["--dtype", leg])
    httpd = serve(build_parser().parse_args(argv))
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()

    clip = np.random.default_rng(0).uniform(
        -1, 1, (1, args.nfr, args.isize, args.isize, 3)).astype(np.float32)
    body = clip.tobytes()
    url = f"http://127.0.0.1:{port}/predict"

    def post():
        req = urllib.request.Request(url, data=body, method="POST")
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=300) as r:
            r.read()
        return time.perf_counter() - t0

    post()  # warm/compile outside the measured window
    lat: list[float] = []
    lock = threading.Lock()
    t_start = time.perf_counter()

    def worker():
        for _ in range(args.requests):
            d = post()
            with lock:
                lat.append(d)

    ts = [threading.Thread(target=worker)
          for _ in range(args.concurrency)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t_start
    httpd.shutdown()
    httpd.inference.close()

    lat_ms = np.sort(np.asarray(lat)) * 1e3
    q = lambda p: float(np.percentile(lat_ms, p))
    return {"leg": leg, "n": len(lat_ms), "concurrency": args.concurrency,
            "p50_ms": round(q(50), 1), "p95_ms": round(q(95), 1),
            "p99_ms": round(q(99), 1), "mean_ms": round(float(lat_ms.mean()), 1),
            "clips_per_sec": round(len(lat_ms) / wall, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="clstm",
                    choices=("clstm", "c2plus1d", "mygan"))
    ap.add_argument("--legs", default="bfloat16,int8")
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--requests", type=int, default=25)
    ap.add_argument("--isize", type=int, default=128)
    ap.add_argument("--nfr", type=int, default=16)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--port", type=int, default=8931)
    args = ap.parse_args()

    from vfd_gan_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    ckpt = make_ckpt(args.family, args.isize, args.nfr)
    results = []
    for i, leg in enumerate(args.legs.split(",")):
        r = run_leg(leg.strip(), ckpt, args, args.port + i)
        results.append(r)
        print(json.dumps({"family": args.family, **r}), flush=True)


if __name__ == "__main__":
    main()
