#!/usr/bin/env python
"""Benchmark: MyGAN fused train step at the reference's default workload.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

Workload (reference defaults, lib/args.py:20-24): batch 4 x 3ch x 16 frames
x 128x128, MyGAN G (5-level (2+1)D U-Net, ngf=32) + dual discriminator
(ndf=32), one full fused step per iteration: on-device augmentation, G
forward, optical flow of gt+predicted mask videos, two D passes, G and D
gradients + Adam updates.  This includes everything the reference does per
step — in particular the 2 x B x (T-1) Farneback flows it runs on the CPU.

``vs_baseline`` compares clips/sec against the PyTorch-reference equivalent
step measured on this host's CPU (tools/measure_cpu_baseline.py, cached in
BASELINE_CPU.json).  If the cache is missing, vs_baseline is reported as 0.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np

STEPS = int(os.environ.get("BENCH_STEPS", 10))
# b8 default since the round-6 interleaved sweep (44.7 vs b4's 42.6
# clips/s/chip — flat HBM-bound scaling from b2 up, b8 the consistent
# peak; BENCH_NOTES.md batch-scaling table).  BENCH_BATCH=4 restores the
# reference's default workload shape.
BATCH = int(os.environ.get("BENCH_BATCH", 8))
# A/B knob for the flow resolution line (ops/flow.py video_to_flow_rgb);
# default follows Config.flow_scale = 0.5 (score-invariant, PARITY.md —
# BENCH_FLOW_SCALE=1.0 measures the reference-telemetry configuration)
FLOW_SCALE = float(os.environ.get("BENCH_FLOW_SCALE", 0.5))
NFR = 16
ISIZE = 128


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vfd_gan_tpu.config import Config
    from vfd_gan_tpu.ops.augment import staging_size
    from vfd_gan_tpu.train.gan_engine import MyGanEngine
    from vfd_gan_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    n_chips = len(jax.devices())
    tmp = tempfile.mkdtemp(prefix="bench_")
    cfg = Config(model="mygan", isize=ISIZE, nfr=NFR, batchsize=BATCH,
                 ngf=32, ndf=32, ep=1, freq=10 ** 9,
                 compute_dtype="bfloat16", tensorboard=False,
                 flow_scale=FLOW_SCALE,
                 result_root=tmp).validate()
    engine = MyGanEngine(cfg, train_iter=None, test_iter=None)

    # Synthetic staged batch generated ON DEVICE: the benchmark measures the
    # train step, not the attachment link's host->device bandwidth.
    s = staging_size(ISIZE)

    @jax.jit
    def make_batch(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "data": jax.random.randint(k1, (BATCH, NFR, s, s, 3), 0, 255,
                                       jnp.uint8),
            "real": jax.random.randint(k2, (BATCH, NFR, s, s, 3), 0, 255,
                                       jnp.uint8),
            "mask": (jax.random.randint(k3, (BATCH, NFR, s, s, 1), 0, 2,
                                        jnp.uint8) * 255).astype(jnp.uint8),
            "label": jnp.ones((BATCH, NFR), jnp.float32),
        }

    sharded = make_batch(jax.random.key(1))

    key = jax.random.key(0)
    g, d = engine.g_state, engine.d_state
    # warmup / compile; the scalar fetch forces real completion (plain
    # block_until_ready is unreliable over remote attachments)
    g, d, metrics, _ = engine._train_step(g, d, sharded, key)
    float(metrics["d/err_d/train"])

    t0 = time.perf_counter()
    for i in range(STEPS):
        key, sub = jax.random.split(key)
        g, d, metrics, _ = engine._train_step(g, d, sharded, sub)
    float(metrics["d/err_d/train"])
    elapsed = time.perf_counter() - t0

    clips_per_sec = BATCH * STEPS / elapsed
    per_chip = clips_per_sec / max(1, n_chips)

    # Approximate MFU: XLA's analytic FLOP count for the fused step over the
    # device's peak (so rounds optimise against the hardware ceiling, not the
    # 1-thread-CPU multiplier — VERDICT.md round-1 item 10).
    mfu, flops_per_step = 0.0, 0.0
    try:
        cost = engine._train_step.lower(
            g, d, sharded, key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0))
        peak = _peak_flops(jax.devices()[0])
        if flops_per_step > 0 and peak > 0:
            mfu = flops_per_step / (elapsed / STEPS) / peak
    except Exception:
        pass

    vs_baseline = 0.0
    base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_CPU.json")
    if os.path.exists(base_file):
        with open(base_file) as f:
            base = json.load(f)
        base_cps = base.get("clips_per_sec", 0.0)
        if base_cps > 0:
            vs_baseline = clips_per_sec / base_cps

    print(json.dumps({
        "metric": "mygan_train_step_clips_per_sec_per_chip",
        "value": round(per_chip, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(vs_baseline, 2),
        "mfu": round(mfu, 5),
        "flops_per_step": flops_per_step,
    }))
    engine.close()


def _peak_flops(device) -> float:
    """Peak dense bf16 FLOP/s by device kind (public spec sheets); 0 when
    unknown so MFU degrades to unreported rather than wrong."""
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "v5 lite": 197e12, "v5litepod": 197e12, "v5e": 197e12,
        "v4": 275e12,
        "v5p": 459e12, "v5": 459e12,
        "v6e": 918e12, "v6 lite": 918e12, "trillium": 918e12,
    }
    for name, peak in table.items():
        if name in kind:
            return peak
    return 0.0


if __name__ == "__main__":
    main()
