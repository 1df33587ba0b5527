#!/usr/bin/env python
"""Benchmark: fused train step at the reference's default workload.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

Default leg (the driver's metric): MyGAN.  Workload (reference defaults,
lib/args.py:20-24): batch 4 x 3ch x 16 frames x 128x128, MyGAN G (5-level
(2+1)D U-Net, ngf=32) + dual discriminator (ndf=32), one full fused step
per iteration: on-device augmentation, G forward, optical flow of
gt+predicted mask videos, two D passes, G and D gradients + Adam updates.
This includes everything the reference does per step — in particular the
2 x B x (T-1) Farneback flows it runs on the CPU.

``BENCH_MODEL={mygan,c2plus1d,xception,clstm,anogan,ganomaly}`` selects the
model family (VERDICT r3 item 4: publish a train-step table for the whole
zoo, not just mygan).  Non-mygan metrics are named
``{model}_train_step_clips_per_sec_per_chip``.

``vs_baseline`` compares clips/sec against the PyTorch-reference equivalent
step measured on this host's CPU (tools/measure_cpu_baseline.py, cached in
BASELINE_CPU.json — mygan only; other legs report 0).  ``mfu``/``mbu`` are
XLA's analytic flops / bytes-accessed for the compiled step over the
device's peak compute / HBM bandwidth (VERDICT r3 item 1: the bandwidth
roofline, not just the compute one).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np

MODEL = os.environ.get("BENCH_MODEL", "mygan")
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
NFR = int(os.environ.get("BENCH_NFR", 16))
ISIZE = int(os.environ.get("BENCH_ISIZE", 128))


def _build_engine(cfg):
    """Engine + a step closure `(carry, batch, key) -> (carry, scalar)`."""
    if cfg.model == "mygan":
        from vfd_gan_tpu.train.gan_engine import MyGanEngine
        eng = MyGanEngine(cfg, train_iter=None, test_iter=None)

        def step(carry, batch, key):
            g, d = carry
            g, d, metrics, _ = eng._train_step(g, d, batch, key)
            return (g, d), metrics["d/err_d/train"]
        return eng, (eng.g_state, eng.d_state), step
    if cfg.model == "anogan":
        from vfd_gan_tpu.train.anogan_engine import AnoGanEngine
        eng = AnoGanEngine(cfg, train_iter=None, test_iter=None)

        def step(carry, batch, key):
            g, d = carry
            g, d, metrics, _ = eng._train_step(g, d, batch, key, True)
            return (g, d), metrics["d/err_d/train"]
        return eng, (eng.g_state, eng.d_state), step
    if cfg.model == "ganomaly":
        from vfd_gan_tpu.train.ganomaly_engine import GanomalyEngine
        eng = GanomalyEngine(cfg, train_iter=None, test_iter=None)

        def step(carry, batch, key):
            g, d = carry
            g, d, metrics, _ = eng._train_step(g, d, batch, key)
            return (g, d), metrics["d/err_d/train"]
        return eng, (eng.g_state, eng.d_state), step
    # supervised family: c2plus1d / xception / clstm
    from vfd_gan_tpu.train.supervised_engine import SupervisedEngine
    eng = SupervisedEngine(cfg, train_iter=None, test_iter=None)

    def step(carry, batch, key):
        (state,) = carry
        state, loss, _ = eng._train_step(state, batch, key, True)
        return (state,), loss
    return eng, (eng.state,), step


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vfd_gan_tpu.config import Config
    from vfd_gan_tpu.ops.augment import staging_size
    from vfd_gan_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    n_chips = len(jax.devices())
    tmp = tempfile.mkdtemp(prefix="bench_")
    cfg = Config(model=MODEL, isize=ISIZE, nfr=NFR, batchsize=BATCH,
                 ngf=32, ndf=32, ep=1, freq=10 ** 9,
                 compute_dtype="bfloat16", tensorboard=False,
                 flow_scale=FLOW_SCALE,
                 int8_disc=os.environ.get("BENCH_INT8_DISC", "0") == "1",
                 remat=os.environ.get("BENCH_REMAT", "0") == "1",
                 remat_blocks=os.environ.get("BENCH_REMAT_BLOCKS", ""),
                 result_root=tmp).validate()
    engine, carry, step = _build_engine(cfg)

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
    # warmup / compile; the scalar fetch forces real completion (plain
    # block_until_ready is unreliable over remote attachments)
    carry, scalar = step(carry, sharded, key)
    float(scalar)

    t0 = time.perf_counter()
    for i in range(STEPS):
        key, sub = jax.random.split(key)
        carry, scalar = step(carry, sharded, sub)
    float(scalar)
    elapsed = time.perf_counter() - t0

    clips_per_sec = BATCH * STEPS / elapsed
    per_chip = clips_per_sec / max(1, n_chips)

    # Roofline utilisation from XLA's analytic cost model for the compiled
    # step: MFU (flops over bf16 peak) AND MBU (HBM bytes-accessed over peak
    # bandwidth).  MBU is the missing leg of the round-3 "HBM-bound" claim
    # (VERDICT r3 weak-1): flat batch scaling alone can't distinguish a
    # bandwidth wall from a fixed overhead tail.
    mfu, flops_per_step = 0.0, 0.0
    mbu, bytes_per_step = 0.0, 0.0
    mbu_analytic, bytes_analytic = 0.0, 0.0
    try:
        compiled = _step_compiled(engine, cfg, carry, sharded, key)
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0))
        bytes_analytic = float(cost.get("bytes accessed", 0.0))
        # Headline MBU basis: the instruction-boundary HBM model over the
        # post-optimization HLO (tools/bytes_report.py) — slice-, in-place-
        # DUS- and memory-space-aware.  cost_analysis() "bytes accessed"
        # counts VMEM-fused operand bytes and VMEM-resident (S(1)) buffers
        # as HBM traffic (clstm's analytic MBU read an impossible >1.0);
        # kept as mbu_analytic for cross-round continuity.
        try:
            bytes_per_step = float(sum(
                r["bytes"] for r in _modelled_rows(compiled.as_text())))
        except Exception:
            bytes_per_step = 0.0
        peak = _peak_flops(jax.devices()[0])
        peak_bw = _peak_bw(jax.devices()[0])
        if flops_per_step > 0 and peak > 0:
            mfu = flops_per_step / (elapsed / STEPS) / peak
        if bytes_analytic > 0 and peak_bw > 0:
            mbu_analytic = bytes_analytic / (elapsed / STEPS) / peak_bw
        if bytes_per_step > 0 and peak_bw > 0:
            mbu = bytes_per_step / (elapsed / STEPS) / peak_bw
        else:
            mbu, bytes_per_step = mbu_analytic, bytes_analytic
    except Exception:
        pass

    vs_baseline = 0.0
    if cfg.model == "mygan":
        base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_CPU.json")
        if os.path.exists(base_file):
            with open(base_file) as f:
                base = json.load(f)
            base_cps = base.get("clips_per_sec", 0.0)
            if base_cps > 0:
                vs_baseline = clips_per_sec / base_cps

    print(json.dumps({
        "metric": f"{cfg.model}_train_step_clips_per_sec_per_chip",
        "value": round(per_chip, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(vs_baseline, 2),
        "mfu": round(mfu, 5),
        "mbu": round(mbu, 5),
        "mbu_analytic": round(mbu_analytic, 5),
        "flops_per_step": flops_per_step,
        "bytes_per_step": bytes_per_step,
        "bytes_analytic": bytes_analytic,
    }))
    engine.close()


def _step_lower_args(cfg, carry, sharded, key):
    """Positional args to ``engine._train_step.lower`` for the current leg
    (shared with tools/bytes_report.py)."""
    if cfg.model in ("mygan", "anogan", "ganomaly"):
        g, d = carry
        return ((g, d, sharded, key, True) if cfg.model == "anogan"
                else (g, d, sharded, key))
    return (carry[0], sharded, key, True)


def _step_compiled(engine, cfg, carry, sharded, key):
    """The compiled train step for the current leg (cost + HLO text)."""
    args = _step_lower_args(cfg, carry, sharded, key)
    return engine._train_step.lower(*args).compile()


def _modelled_rows(hlo_text: str):
    """Instruction-boundary HBM rows via tools/bytes_report.build_table."""
    import importlib.util
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "bytes_report.py")
    spec = importlib.util.spec_from_file_location("_vfd_bytes_report", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.build_table(hlo_text)


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


def _peak_bw(device) -> float:
    """Peak HBM bandwidth (bytes/s) by device kind (public spec sheets)."""
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "v5 lite": 819e9, "v5litepod": 819e9, "v5e": 819e9,
        "v4": 1228e9,
        "v5p": 2765e9, "v5": 2765e9,
        "v6e": 1640e9, "v6 lite": 1640e9, "trillium": 1640e9,
    }
    for name, peak in table.items():
        if name in kind:
            return peak
    return 0.0


if __name__ == "__main__":
    main()
