"""Typed configuration for the TPU-native vfd_gan framework.

The public flag surface mirrors the reference CLI (reference: lib/args.py:8-39)
so a user of ``umaionigiri/vfd_gan`` can switch over without relearning flags:

    --ep --tr_plist --ts_plist --result_root --isize --ich --nfr --batchsize
    --workers --model --lr --beta1 --w_adv --w_con --pos_weight --freq
    --resume --ae

TPU-native additions are grouped at the bottom (device mesh, dtype policy,
seed).  Unlike the reference, no defaults point at hardcoded cluster paths
(reference quirk: lib/args.py:12-14), and ``--gpu`` is accepted but only used
to derive a data-parallel device count.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any

MODELS = ("mygan", "anogan", "c2plus1d", "xception", "clstm", "ganomaly")


@dataclasses.dataclass
class Config:
    """All knobs for training/eval.  Field names match reference flags."""

    # Schedule
    ep: int = 10

    # Paths (no hardcoded cluster defaults, unlike lib/args.py:12-14)
    tr_plist: str = ""
    ts_plist: str = ""
    result_root: str = "results"

    # Data
    isize: int = 128
    ich: int = 3
    nfr: int = 16
    batchsize: int = 4
    workers: int = 4

    # Model selection (reference: lib/args.py:27)
    model: str = "mygan"

    # Optimisation (reference defaults: lib/args.py:30-36)
    lr: float = 2e-5
    beta1: float = 0.5
    w_adv: float = 1.0
    w_con: float = 10.0
    pos_weight: float = 2.0
    freq: int = 50

    resume: str = ""
    ae: bool = False

    # Network widths (reference fixes ngf=ndf=32,
    # models/mygannet.py:32,120).  Exposed for scaling studies and tests.
    ngf: int = 32
    ndf: int = 32
    # Xception-3D channel-width multiplier (1.0 = exact reference widths,
    # xception.py:92-174).  Like --ngf/--ndf for mygan: a scaling knob for
    # capacity studies and fast multi-device tests of the pipeline path.
    xwidth: float = 1.0

    # ---- TPU-native extensions (no reference equivalent) ----
    # Number of data-parallel shards; 0 = use all local devices.
    dp: int = 0
    # Sequence-parallel shards: >1 builds a 2-D (dp, sp) device mesh and
    # shards the clip's frame axis across it — GSPMD partitions the whole
    # fused train step (temporal convs become halo collective-permutes, BN
    # stats all-reduce over both axes).  For clips too long for one chip's
    # HBM.  Requires nfr % sp == 0 and dp*sp <= device count.
    sp: int = 1
    # Tensor-parallel shards: >1 adds a `tp` mesh axis and shards every
    # network's channel dimension over it (Megatron-style column sharding of
    # each kernel's output-channel axis; biases, BN state and Adam moments
    # follow).  Per-device parameter/optimiser memory drops ~1/tp for wide
    # models (--ngf/--ndf scaling studies); GSPMD inserts the activation
    # collectives.  Channel dims not divisible by tp stay replicated.
    # Requires dp*sp*tp <= device count.
    tp: int = 1
    # Pipeline-parallel stages (GPipe): >1 adds a `pp` mesh axis and
    # stage-shards Xception-3D's eight identity middle blocks over it —
    # each device holds 8/pp consecutive blocks' params/Adam/BN state, the
    # batch is cut into `pp_micro` microbatches, and activations hand off
    # between neighbouring devices via ppermute inside one jitted step
    # (parallel/pipeline.py).  Composes with dp (dp x pp mesh); the trunk's
    # dominant parameter mass lives split 1/pp per device.  Currently the
    # xception model only (the one reference family with a deep
    # uniform-signature chain).  Requires 8 % pp == 0.
    pp: int = 1
    # GPipe microbatches per step (0 = pp).  More microbatches shrink the
    # pipeline bubble (pp-1 of pp_micro+pp-1 ticks idle); BatchNorm batch
    # statistics are per-microbatch, exactly like --accum.  Requires
    # batchsize % pp_micro == 0 and (batchsize/pp_micro) % dp == 0.
    pp_micro: int = 0
    # Mixture-of-Experts extension (xception only; no reference
    # equivalent): > 0 inserts a residual token-MoE block after the middle
    # chain — every spatio-temporal trunk position routed top-1 through N
    # expert MLPs (GShard dense dispatch, parallel/moe.py).
    moe_experts: int = 0
    # Expert-parallel shards: > 1 adds an `ep` mesh axis and shards the
    # stacked expert parameters/Adam moments over it; GSPMD inserts the
    # token all-to-alls.  Requires moe_experts % moe_shards == 0.
    moe_shards: int = 1
    # Weight of the Switch load-balancing auxiliary loss.
    moe_aux_w: float = 0.01
    # Gradient accumulation: split each batch into `accum` sequential
    # microbatches inside the fused step (lax.scan), average the gradients,
    # and take ONE optimiser step.  BatchNorm batch statistics are computed
    # and the running stats updated per microbatch — exactly the semantics
    # of running the reference at batchsize/accum with K accumulation steps.
    # Activation memory scales with the microbatch, enabling effective
    # batches beyond one chip's HBM.  mygan + supervised engines.
    accum: int = 1
    # Computation dtype for the model body ("bfloat16" or "float32").
    # Parameters and optimiser state always stay float32.
    compute_dtype: str = "bfloat16"
    # PRNG seed for init/augmentation/dropout/z-sampling.
    seed: int = 0
    # NOTE: BatchNorm batch statistics are always synchronised across the DP
    # mesh (global-batch stats under GSPMD jit).  The reference's
    # DataParallel computed per-replica statistics; the cross-replica sync
    # is a deliberate, documented divergence (PARITY.md, SURVEY.md §2.3) —
    # there is intentionally no flag pretending otherwise.
    #
    # Morphological-opening plane for scored/visualised masks:
    # "th" replicates the reference's accidental (T, H)-plane opening
    # (cv2 reads its (T, H, W) input as a T-row x H-col x W-channel image,
    # lib/utils.py:139-147); "hw" is the intended per-frame opening.
    morph_plane: str = "th"
    # Host->device prefetch depth for the input pipeline.
    prefetch: int = 2
    # Emit a TensorBoard event file (scalars + video grids).
    tensorboard: bool = True
    # Use the host cv2 optical-flow path instead of the on-device kernel
    # (parity-audit escape hatch; SURVEY.md §7 "hard parts").
    host_flow: bool = False
    # Crash recovery: write a rolling "latest" full-state checkpoint every N
    # steps (0 = off).  The reference loses the epoch on a crash
    # (SURVEY.md §5 failure detection).
    autosave_every: int = 0
    # Overlap the autosave's Orbax serialisation/write with training (the
    # state fetch stays synchronous — the fused steps donate their input
    # buffers).  Single-flight: a save that would overlap the previous
    # write is skipped for that cadence (train/checkpoints.AsyncSaver).
    autosave_async: bool = False
    # Stop after N optimiser steps regardless of epochs (0 = unlimited).
    # Pairs with autosave/resume for preemption-safe scheduled training.
    max_steps: int = 0
    # Optical-flow resolution scale for the GAN step: flow is computed at
    # scale*isize and the HSV-encoded RGB upsampled back (ops/flow.py).
    # Default 0.5 (+4.8% step throughput): provably SCORE-INVARIANT — the
    # reference's adversarial term is detached from G
    # (models/mygannet.py:279-312), so flow touches only D's training
    # trajectory and loss telemetry, never G's updates or the scored
    # masks (tests/test_flow_scale_invariance.py pins G bit-equality).
    # Set 1.0 for reference-fidelity D telemetry (PARITY.md).
    flow_scale: float = 0.5
    # Rematerialise generator conv blocks in backward (memory for FLOPs;
    # enables long-clip / large-batch configurations).
    remat: bool = False
    # With --remat: comma-separated block names to rematerialise (empty =
    # all).  "dconv1,uconv1" = only the two full-resolution U-Net levels,
    # whose saved residuals dominate backward HBM reads (the selective
    # bytes-for-flops trade; measured A/Bs in BENCH_NOTES.md round 5).
    remat_blocks: str = ""
    # Cache the gt-mask flow videos across periodic test sweeps (the gt
    # masks are static per clip; recomputing their Farneback flow every
    # sweep is pure waste).  Costs device memory: ~3 MB f32 per test clip
    # at 128^2 x 16 frames.  Near-exact — see PARITY.md "gt-flow cache".
    cache_gt_flow: bool = False
    # Fidelity mode: replicate the reference's train/eval-mode bugs for
    # score-identical runs (PARITY.md "train/eval-mode quirks").  By default
    # this framework uses correct mode handling (a documented divergence);
    # with the flag on: (a) MyGAN's periodic test sweep runs G and D in
    # *train* mode — dropout active, BN normalising by batch stats and
    # mutating the running stats — because the reference's MyGAN.test never
    # calls .eval() (models/mygannet.py:369-441); (b) STCNN-family and
    # AnoGAN training runs in *eval* mode after the first periodic test —
    # dropout off, BN frozen at running stats — because their test() calls
    # .eval() and never switches back (lib/train_stcnn.py:143,
    # models/anogan.py:145-147).  GANomaly never ran in the reference, so
    # the flag has no effect there.
    ref_mode_quirks: bool = False
    # Int8 discriminator branch in the MyGAN train step: D's (2+1)D convs
    # run int8 forward (dynamic per-tensor activation scales, per-channel
    # weights, int32 MXU accumulation) with straight-through float
    # gradients (quant/qdisc.py).  PROVABLY score-invariant: G's update has
    # no D term (the adversarial value is detached telemetry,
    # models/mygannet.py:279-312; pinned by tests/test_int8_disc.py) — only
    # D's own trajectory and the loss telemetry change.  Perf experiment
    # knob; see BENCH_NOTES for the measured number.
    int8_disc: bool = False
    # Score the periodic test sweep ON DEVICE (eval/device_metrics.py):
    # one jitted sort+cumsum computes ROC/EER/PR/F1 and only scalars cross
    # the host link, instead of fetching every sweep batch's full gt/pred
    # arrays.  Numerics pinned against sklearn (tests/test_device_metrics).
    # The improved-only ROC/PR curve PNG+CSV artifacts are skipped in this
    # mode (they need the host arrays it avoids fetching).
    device_scoring: bool = False
    # On-device synthetic data mode: N train batches per epoch generated by
    # a jitted PRNG function instead of the mp4 pipeline
    # (data/device_synthetic.py).  For soak tests and benchmarking of the
    # full engine loop where host->device bandwidth (or a missing dataset)
    # would starve the accelerator; --tr_plist/--ts_plist become optional.
    # 0 = off (real data).
    synthetic_data: int = 0
    # Test-split batches per sweep in synthetic mode (kept small: the sweep
    # fetches gt/pred to host for ROC scoring).
    synthetic_test_batches: int = 2
    # Synthetic GT = the filled forged square instead of its boundary ring.
    # The opened-binary scoring erases 1-px rings (sweep ROC pinned at 0.5
    # by construction); filled regions survive the 5x5 opening so the
    # scored ROC can demonstrate learning (tools/soak.py --learning).
    synthetic_thick_masks: bool = False

    def validate(self) -> "Config":
        if self.model not in MODELS:
            raise ValueError(f"unknown model {self.model!r}; expected one of {MODELS}")
        if self.isize % 8 or self.nfr % 8:
            # The U-Net/AnoGAN topologies halve T/H/W several times
            # (reference shape walk: models/mygannet.py:55-99, anogan.py:39-79).
            raise ValueError("isize and nfr must be multiples of 8")
        if self.model == "mygan" and (self.isize < 64 or self.nfr < 16):
            # SpatialDisc halves H/W six times (models/mygannet.py:119-162)
            # and the U-Net halves T four times (models/mygannet.py:55-68);
            # anything smaller reaches zero size mid-network.
            raise ValueError("model 'mygan' needs isize >= 64 and nfr >= 16 "
                             "(64x spatial / 16x temporal downsampling)")
        if self.compute_dtype not in ("bfloat16", "float32"):
            raise ValueError("compute_dtype must be bfloat16 or float32")
        if self.sp < 1 or (self.sp > 1 and self.nfr % self.sp):
            raise ValueError("sp must be >= 1 and divide nfr")
        if self.tp < 1:
            raise ValueError("tp must be >= 1")
        if self.morph_plane not in ("th", "hw"):
            raise ValueError("morph_plane must be 'th' or 'hw'")
        if self.accum < 1 or self.batchsize % self.accum:
            raise ValueError("accum must be >= 1 and divide batchsize")
        if self.accum > 1 and self.model in ("anogan", "ganomaly"):
            raise ValueError(
                "--accum supports the mygan and supervised engines")
        if self.pp < 1 or (self.pp > 1 and 8 % self.pp):
            raise ValueError("pp must be >= 1 and divide the 8 middle blocks")
        if self.pp > 1:
            if self.model != "xception":
                raise ValueError("--pp supports the xception model only")
            if self.sp > 1 or self.tp > 1 or self.accum > 1:
                raise ValueError("--pp does not compose with sp/tp/accum")
        if self.pp_micro < 0 or (self.pp_micro and
                                 self.batchsize % self.pp_micro):
            raise ValueError("pp_micro must be >= 0 and divide batchsize")
        if self.moe_experts < 0 or self.moe_shards < 1:
            raise ValueError("moe_experts must be >= 0, moe_shards >= 1")
        if self.moe_experts and self.model != "xception":
            raise ValueError("--moe_experts supports the xception model only")
        if self.moe_experts and self.pp > 1:
            raise ValueError("--moe_experts does not compose with --pp")
        if self.moe_shards > 1 and (not self.moe_experts or
                                    self.moe_experts % self.moe_shards):
            raise ValueError("moe_shards must divide moe_experts")
        if self.ref_mode_quirks and self.accum > 1:
            # the reference has no gradient accumulation; a fidelity run
            # must match its per-step semantics exactly
            raise ValueError("--ref_mode_quirks does not compose with --accum")
        return self

    @property
    def n_pp_micro(self) -> int:
        """Effective GPipe microbatch count (``--pp_micro``, default pp)."""
        return self.pp_micro if self.pp_micro else self.pp

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=4)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known}).validate()


def build_parser() -> argparse.ArgumentParser:
    """Argparse front-end mirroring reference flag names (lib/args.py:8-39)."""
    p = argparse.ArgumentParser(description="TPU-native vfd_gan trainer")
    p.add_argument("--gpu", default="0", type=str,
                   help="accepted for reference compatibility; device count is "
                        "taken from --dp / jax.devices() instead")
    defaults = Config()
    for f in dataclasses.fields(Config):
        flag = f"--{f.name}"
        if f.type == "bool" or isinstance(getattr(defaults, f.name), bool):
            # BooleanOptionalAction so True-default flags are disable-able
            # (--no-tensorboard); plain store_true could never turn them off.
            p.add_argument(flag, default=getattr(defaults, f.name),
                           action=argparse.BooleanOptionalAction)
        else:
            p.add_argument(flag, default=getattr(defaults, f.name),
                           type=type(getattr(defaults, f.name)))
    return p


def parse_args(argv: list[str] | None = None) -> Config:
    ns = build_parser().parse_args(argv)
    d = vars(ns)
    d.pop("gpu", None)
    return Config.from_dict(d)
