"""Training entry point — reference-compatible UX.

Mirrors ``python trainer.py --model {mygan,anogan,c2plus1d,xception,clstm}``
(reference trainer.py:18-42, flag surface lib/args.py:8-39) plus the
``ganomaly`` model the reference intended but shipped broken
(trainer.py:25-27).  Device selection is automatic (the JAX runtime owns
the chips; ``--gpu`` is accepted and ignored, ``--dp`` bounds the mesh).
"""

from __future__ import annotations

import sys

from vfd_gan_tpu.config import Config, parse_args
from vfd_gan_tpu.data import ClipBatchIterator, MdfVideoDataset
from vfd_gan_tpu.ops.augment import staging_size


def build_iterators(cfg: Config):
    """Train/test batch iterators with the reference's loader semantics
    (both splits shuffled + drop_last during training, lib/data.py:142)."""
    if cfg.synthetic_data:
        # on-device generated batches (soak/benchmark mode) — the loop,
        # sweeps, checkpointing and resume all run exactly as with real data
        from vfd_gan_tpu.data.device_synthetic import DeviceSyntheticIterator
        return (DeviceSyntheticIterator(
                    cfg.batchsize, cfg.nfr, staging_size(cfg.isize),
                    n_batches=cfg.synthetic_data, seed=cfg.seed,
                    thick_masks=cfg.synthetic_thick_masks),
                DeviceSyntheticIterator(
                    cfg.batchsize, cfg.nfr, cfg.isize,
                    n_batches=cfg.synthetic_test_batches, seed=cfg.seed + 1,
                    thick_masks=cfg.synthetic_thick_masks))
    train_ds = MdfVideoDataset(cfg.tr_plist, cfg.nfr,
                               staging=staging_size(cfg.isize))
    test_ds = MdfVideoDataset(cfg.ts_plist, cfg.nfr, staging=cfg.isize)
    return (ClipBatchIterator(train_ds, cfg.batchsize, shuffle=True,
                              seed=cfg.seed, prefetch=cfg.prefetch,
                              workers=cfg.workers),
            ClipBatchIterator(test_ds, cfg.batchsize, shuffle=True,
                              seed=cfg.seed, prefetch=cfg.prefetch,
                              workers=cfg.workers))


def build_engine(cfg: Config, train_iter, test_iter):
    """Model dispatch (reference trainer.py:18-40)."""
    if cfg.model == "mygan":
        from vfd_gan_tpu.train.gan_engine import MyGanEngine
        return MyGanEngine(cfg, train_iter, test_iter)
    if cfg.model == "anogan":
        from vfd_gan_tpu.train.anogan_engine import AnoGanEngine
        return AnoGanEngine(cfg, train_iter, test_iter)
    if cfg.model == "ganomaly":
        from vfd_gan_tpu.train.ganomaly_engine import GanomalyEngine
        return GanomalyEngine(cfg, train_iter, test_iter)
    if cfg.model in ("c2plus1d", "xception", "clstm"):
        from vfd_gan_tpu.train.supervised_engine import SupervisedEngine
        return SupervisedEngine(cfg, train_iter, test_iter)
    raise ValueError(f"unknown model {cfg.model!r}")


def main(argv=None) -> None:
    from vfd_gan_tpu.utils.runtime import (
        enable_compilation_cache,
        init_distributed,
    )
    if init_distributed():
        # multi-host (DCN) job: jax.devices() is now the global list; the
        # GSPMD engines work unchanged (utils/runtime.py DistributedSpec)
        import jax
        print(f" >> multi-host job: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices")
    enable_compilation_cache()
    cfg = parse_args(argv)
    if not cfg.synthetic_data and (not cfg.tr_plist or not cfg.ts_plist):
        print("error: --tr_plist and --ts_plist are required "
              "(no hardcoded dataset defaults; or use --synthetic_data N)",
              file=sys.stderr)
        sys.exit(2)
    train_iter, test_iter = build_iterators(cfg)
    engine = build_engine(cfg, train_iter, test_iter)
    try:
        engine.train()
    finally:
        engine.close()


if __name__ == "__main__":
    main()
