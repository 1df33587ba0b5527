"""Shared engine scaffolding: run dirs, summaries, best-metric tracking.

Replaces the reference's ``GANBaseModel``/``VFD_STCNN`` boilerplate
(lib/train_gan.py:17-57, lib/train_stcnn.py:19-50): run-dir layout,
TensorBoard writer, config dump, periodic-summary dicts, ROC/PR best
trackers and the best-checkpoint rule — save on ROC improvement, else on PR
improvement (models/mygannet.py:449-454: the PR checkpoint is only written
when ROC did *not* improve).
"""

from __future__ import annotations

import os

import numpy as np

from vfd_gan_tpu.eval.metrics import evaluate
from vfd_gan_tpu.obs.profiling import StepTimer
from vfd_gan_tpu.obs.summary import SummaryLogger, make_run_dirs, run_comment
from vfd_gan_tpu.parallel.mesh import auto_dp, make_mesh


class SweepAccumulator:
    """Per-batch accumulation over one periodic test sweep.

    Collects ground-truth/score arrays for ROC/PR scoring plus running sums
    of per-batch metric telemetry; shared by every engine (this logic was
    previously triplicated across the GAN/AnoGAN/supervised sweeps).
    ``stacked()`` is only valid when ``n > 0`` — engines route through
    ``EngineBase.score_and_checkpoint``, which handles the empty case.

    ``device=True`` (``--device_scoring``) keeps the per-batch arrays on
    device — the whole ROC/EER/PR/F1 aggregation then runs in one jitted
    sort-and-cumsum (eval/device_metrics.py) and only scalars cross the
    host link, instead of fetching every sweep batch's full gt/pred.
    """

    def __init__(self, device: bool = False):
        self.device = device
        self.gts: list = []
        self.preds: list = []
        self._sums: dict[str, float] = {}
        self.n = 0

    def add(self, gt, pred, metrics=None) -> None:
        if self.device:
            self.gts.append(gt)
            self.preds.append(pred)
        else:
            self.gts.append(np.asarray(gt))
            self.preds.append(np.asarray(pred))
        for k, v in (metrics or {}).items():
            self._sums[k] = self._sums.get(k, 0.0) + float(v)
        self.n += 1

    def stacked(self) -> tuple[np.ndarray, np.ndarray]:
        return np.stack(self.gts), np.stack(self.preds)

    def mean_metrics(self) -> dict[str, float]:
        return {k: v / self.n for k, v in self._sums.items()} if self.n else {}


class EngineBase:
    """Common state for all training engines."""

    def __init__(self, cfg, train_iter, test_iter, *, gan: bool):
        self.cfg = cfg
        self.train_iter = train_iter
        self.test_iter = test_iter
        # Per-family temporal-conv lowering override (round-5 clean-chip
        # A/B, BENCH_NOTES: c2plus1d is fastest all-emitter, 57.2 vs
        # width-rule 55.2 clips/s/chip; other families keep the width
        # rule).  (Re)set on every engine construction so one process can
        # build engines of different families without leakage; env
        # VFD_TC_XLA still overrides for audits.
        from vfd_gan_tpu.ops import convs
        convs.TC_FORCE_EMITTER = True if cfg.model == "c2plus1d" else None
        sp = getattr(cfg, "sp", 1)
        tp = getattr(cfg, "tp", 1)
        pp = getattr(cfg, "pp", 1)
        ep = getattr(cfg, "moe_shards", 1)
        import jax
        avail = max(1, len(jax.devices()) // (sp * tp * pp * ep))
        # dp must divide the per-step shard unit: the microbatch under
        # --accum (each scan microbatch stays data-parallel), else the batch
        # (under --pp, the GPipe microbatch).
        accum = max(1, getattr(cfg, "accum", 1),
                    cfg.n_pp_micro if pp > 1 else 1)
        self.mesh = make_mesh(
            auto_dp(cfg.batchsize // accum, cfg.dp, n_devices=avail),
            sp, tp, pp, ep=ep)
        self.dirs = make_run_dirs(cfg.result_root, cfg.model,
                                  run_comment(cfg, gan=gan))
        self.summary = SummaryLogger(self.dirs.runs, enabled=cfg.tensorboard)
        self.summary.dump_config(self.dirs.root, cfg)

        self.global_step = 0
        self.epoch = 0
        self.batch_in_epoch = 0
        self.best_roc = 0.0
        self.best_pr = 0.0
        self.timer = StepTimer()
        self._win_start = None  # steady-state throughput window anchor

        # Periodic-summary buffers (flushed every cfg.freq steps,
        # lib/train_gan.py:76-80).
        self.color_videos: dict[str, np.ndarray] = {}
        self.gray_videos: dict[str, np.ndarray] = {}
        self.errors: dict[str, float] = {}
        self.scores: dict[str, float] = {}
        self.hists: dict[str, np.ndarray] = {}

        print(f"\n SAVE PATH == {self.dirs.root} \n")

    # -- generic training loop ---------------------------------------------
    # Engines implement: _do_train_step(batch, key) -> (metrics, viz)
    # (mutating their state), _update_train_videos(viz), test(),
    # _ckpt_tree(), _save_weights(head).

    def train(self) -> None:
        import jax
        from vfd_gan_tpu.parallel.prefetch import device_prefetch
        from vfd_gan_tpu.train.checkpoints import save_checkpoint

        cfg = self.cfg
        print(f" >> Training model {cfg.model}.")
        with self._graceful_shutdown() as stop_signal:
            self._train_loop(jax, device_prefetch, save_checkpoint, cfg,
                             stop_signal)

    def _train_loop(self, jax, device_prefetch, save_checkpoint, cfg,
                    stop_signal) -> None:
        for self.epoch in range(self.epoch, cfg.ep):
            if hasattr(self.train_iter, "epoch"):
                # deterministic pass order + mid-epoch fast-forward (resume)
                self.train_iter.epoch = self.epoch
                self.train_iter.skip_batches = self.batch_in_epoch
            for sharded in device_prefetch(self.train_iter, self.mesh,
                                           depth=max(1, cfg.prefetch)):
                self.global_step += 1
                self.batch_in_epoch += 1
                self.key, step_key = jax.random.split(self.key)
                metrics, viz = self._do_train_step(sharded, step_key)
                self.timer.tick()

                if self.global_step % cfg.freq == 0:
                    # device->host syncs only on the summary cadence.  The
                    # float() fetches are ALSO the throughput sync point:
                    # device execution is in-order, so once this step's
                    # scalars arrive, all `freq` steps of the window have
                    # completed — dispatch-rate timers lie under async
                    # dispatch (a remote TPU enqueues steps instantly).
                    import time as _time
                    self.errors.update(
                        {k: float(v) for k, v in metrics.items()})
                    now = _time.perf_counter()
                    if self._win_start is not None:
                        self.errors["perf/steps_per_sec"] = (
                            cfg.freq / (now - self._win_start))
                    if self.summary.enabled:
                        # video panels exist only for TensorBoard — skip the
                        # (large) device->host viz fetches when it's off
                        self._update_train_videos(viz)
                    self.test()
                    self.flush_summary()
                    # window restarts after the sweep/flush host work, so
                    # the next measurement covers train steps only
                    self._win_start = _time.perf_counter()

                if cfg.autosave_every and \
                        self.global_step % cfg.autosave_every == 0:
                    if getattr(cfg, "autosave_async", False):
                        self._async_saver().save(self.weight_path("latest"),
                                                 self._ckpt_tree())
                    else:
                        save_checkpoint(self.weight_path("latest"),
                                        self._ckpt_tree())

                if cfg.max_steps and self.global_step >= cfg.max_steps:
                    self._wait_autosave()
                    print(f" >> Training model {cfg.model}."
                          f"[Stopped at max_steps={cfg.max_steps}]")
                    return

                if stop_signal():
                    # SIGTERM/SIGINT: park a resumable `latest` checkpoint
                    # (exact-resume loop state included) and exit cleanly —
                    # preemption-safe training (SURVEY.md §5 failure
                    # recovery; the reference loses everything since its
                    # last best-metric save).
                    self._wait_autosave()
                    save_checkpoint(self.weight_path("latest"),
                                    self._ckpt_tree())
                    print(f" >> Training model {cfg.model}."
                          f"[Interrupted by signal {stop_signal()}; "
                          f"saved '{self.weight_path('latest')}' — resume "
                          f"with --resume]")
                    return
            self.batch_in_epoch = 0
        self._wait_autosave()
        print(f" >> Training model {cfg.model}.[Done]")

    def _graceful_shutdown(self):
        """Context manager installing SIGTERM/SIGINT latches for the training
        loop.  Yields a zero-arg callable returning the caught signal number
        (or None); handlers are restored on exit.  No-op off the main thread
        (signal.signal raises ValueError there — e.g. pytest-xdist workers).
        """
        import contextlib
        import signal as _signal

        @contextlib.contextmanager
        def _cm():
            caught: dict = {"sig": None}
            saved = {}
            for sig in (_signal.SIGTERM, _signal.SIGINT):
                try:
                    saved[sig] = _signal.signal(
                        sig, lambda s, _f: caught.__setitem__("sig", s))
                except ValueError:
                    pass
            try:
                yield lambda: caught["sig"]
            finally:
                for sig, handler in saved.items():
                    _signal.signal(sig, handler)
        return _cm()

    # -- exact-resume loop state --------------------------------------------
    def _loop_state(self) -> dict:
        """Everything beyond net/optimiser state needed for bit-exact resume
        (VERDICT.md round-1 Missing #4): engine RNG key, epoch/batch cursor,
        iterator pass counters, and the best-metric trackers that gate the
        if-roc-elif-pr checkpoint rule."""
        import jax
        import numpy as np
        return {
            "epoch": self.epoch,
            "batch_in_epoch": self.batch_in_epoch,
            "key_data": np.asarray(jax.random.key_data(self.key)),
            "train_iter_epoch": getattr(self.train_iter, "epoch", 0),
            "test_iter_epoch": getattr(self.test_iter, "epoch", 0),
            "best_roc": self.best_roc,
            "best_pr": self.best_pr,
        }

    def _apply_loop_state(self, loop: dict) -> None:
        import jax
        self.epoch = int(loop["epoch"])
        self.batch_in_epoch = int(loop["batch_in_epoch"])
        self.key = jax.random.wrap_key_data(loop["key_data"])
        if hasattr(self.train_iter, "epoch"):
            self.train_iter.epoch = int(loop["train_iter_epoch"])
        if hasattr(self.test_iter, "epoch"):
            self.test_iter.epoch = int(loop["test_iter_epoch"])
        self.best_roc = float(loop["best_roc"])
        self.best_pr = float(loop["best_pr"])

    def restore_into(self, path: str, nets: dict) -> dict:
        """Restore ``nets`` (name -> NetState) + step + loop state from a
        checkpoint, tolerating round-1 checkpoints that predate the ``loop``
        sub-tree.  Returns the restored net states by name."""
        from vfd_gan_tpu.train.checkpoints import restore_checkpoint
        target = {**nets, "step": self.global_step,
                  "loop": self._loop_state()}
        try:
            restored = restore_checkpoint(path, target)
        except Exception:  # legacy checkpoint without loop state
            target.pop("loop")
            restored = restore_checkpoint(path, target)
        self.global_step = int(restored["step"])
        if "loop" in restored:
            self._apply_loop_state(restored["loop"])
        return restored

    # -- metrics + best-checkpoint rule ------------------------------------
    def score_and_checkpoint(self, gts, predicts,
                             save_fn) -> tuple[float, float, float]:
        """Flatten, score ROC/PR/F1, update summary dicts, and trigger the
        reference's if-roc-elif-pr checkpoint rule.  ``save_fn(head)`` writes
        the weights.

        Degenerate sweeps are reported, not crashed on: an empty test split
        scores NaN across the board (and saves nothing); single-class labels
        fall through to sklearn's NaN ROC with the same no-save outcome.
        """
        if len(gts) == 0:
            print(" >> test sweep produced no batches "
                  "(empty/short test split); scores are NaN")
            nan = float("nan")
            self.scores.update({"score/roc": nan, "score/pr": nan,
                                "score/f1": nan})
            return nan, nan, nan
        if getattr(getattr(self, "cfg", None), "device_scoring", False):
            return self._score_on_device(gts, predicts, save_fn)
        # The reference casts GT to int32 — truncation binarises fractional
        # (resized) mask edges to 0 (models/mygannet.py:444).
        labels = np.asarray(gts, dtype=np.int32).ravel()
        preds = np.asarray(predicts).ravel()
        if (labels == labels.flat[0]).all():
            # Single-class sweep: ROC undefined, PR degenerate — don't let a
            # meaningless value win the best-checkpoint rule.
            print(" >> test labels are single-class; ROC/PR are undefined "
                  "(scores NaN, no checkpoint)")
            nan = float("nan")
            self.scores.update({"score/roc": nan, "score/pr": nan,
                                "score/f1": nan})
            return nan, nan, nan
        roc = evaluate(labels, preds, self.best_roc, self.epoch,
                       self.dirs.root, metric="roc")
        pr = evaluate(labels, preds, self.best_pr, self.epoch,
                      self.dirs.root, metric="pr")
        f1 = evaluate(labels, preds, metric="f1_score")
        if roc > self.best_roc:
            self.best_roc = roc
            save_fn("roc")
        elif pr > self.best_pr:
            self.best_pr = pr
            save_fn("pr")
        self.scores.update({"score/roc": roc, "score/pr": pr, "score/f1": f1})
        return roc, pr, f1

    def _score_on_device(self, gts, predicts, save_fn):
        """--device_scoring: the whole sweep aggregation runs jitted on
        device (eval/device_metrics.score_sweep); only 4 scalars cross the
        link.  Numerics pinned against sklearn in test_device_metrics.py.
        The improved-only curve PNG/CSV artifacts are skipped (they need
        the host arrays this mode exists to avoid fetching); the
        if-roc-elif-pr best-checkpoint rule is unchanged — NaN scores
        (single-class sweep) save nothing, as in the host path."""
        import jax.numpy as jnp

        from vfd_gan_tpu.eval.device_metrics import score_sweep
        # stacking requires uniform batch shapes (drop_last=True contract);
        # fail loudly rather than crash deep inside jnp.stack if a future
        # iterator yields a ragged final batch
        shapes = {np.shape(g) for g in gts} | {np.shape(p) for p in predicts}
        if len(shapes) > 1:
            raise ValueError(
                f"--device_scoring needs uniform per-batch shapes "
                f"(drop_last iterator); got {sorted(shapes)}")
        roc_v, eer_v, pr_v, f1_v = score_sweep(jnp.stack(gts),
                                               jnp.stack(predicts))
        roc, pr, f1 = float(roc_v), float(pr_v), float(f1_v)
        if not np.isfinite(roc):
            # same contract as the host path: single-class sweeps score NaN
            # across the board and save nothing
            print(" >> test labels are single-class; ROC/PR are undefined "
                  "(scores NaN, no checkpoint)")
            pr = f1 = float("nan")
        elif roc > self.best_roc:
            self.best_roc = roc
            save_fn("roc")
        elif pr > self.best_pr:
            self.best_pr = pr
            save_fn("pr")
        self.scores.update({"score/roc": roc, "score/pr": pr,
                            "score/f1": f1, "score/eer": float(eer_v)})
        return roc, pr, f1

    def flush_summary(self) -> None:
        self.summary.update(self.global_step,
                            color_videos=self.color_videos,
                            gray_videos=self.gray_videos,
                            errors=self.errors,
                            scores=self.scores,
                            hists=self.hists)
        # plain-text metrics stream alongside TB (grep/pandas friendly)
        import json
        rec = {"step": self.global_step, "epoch": self.epoch,
               **{k: float(v) for k, v in self.errors.items()},
               **{k: float(v) for k, v in self.scores.items()}}
        with open(os.path.join(self.dirs.root, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    def _async_saver(self):
        if not hasattr(self, "_autosaver"):
            from vfd_gan_tpu.train.checkpoints import AsyncSaver
            self._autosaver = AsyncSaver()
        return self._autosaver

    def _wait_autosave(self) -> None:
        """Join any in-flight --autosave_async write (before final saves,
        restores of the same path, or process exit)."""
        if hasattr(self, "_autosaver"):
            self._autosaver.wait()

    def close(self) -> None:
        self._wait_autosave()
        self.summary.close()

    # -- summary-only morphology -------------------------------------------
    def viz_morphology(self, pred):
        """Threshold + morphological opening for the summary videos, jitted
        separately from the train step.

        The reference derives its ``t_pre``/``m_pre`` summary panels from the
        prediction on every summary flush (lib/train_gan.py:76-80 panels,
        lib/utils.py:139-147 opening).  Computing them inside the fused train
        step costs ~10 ms/step on TPU (knockout-measured, BENCH_NOTES.md) yet
        they are consumed only every ``cfg.freq`` steps — so engines keep the
        hot step free of them and call this at summary cadence.  Eval steps
        still compute ``m_pre`` inline: there it is the scored prediction,
        needed for every batch.
        """
        if not hasattr(self, "_viz_morph"):
            import jax
            from vfd_gan_tpu.ops.image import threshold
            from vfd_gan_tpu.ops.morphology import video_open
            plane = self.cfg.morph_plane

            def _morph(p):
                t = threshold(p)
                return t, video_open(t, plane)

            self._viz_morph = jax.jit(_morph)
        return self._viz_morph(pred)

    # -- reference fidelity mode -------------------------------------------
    @property
    def stuck_in_eval(self) -> bool:
        """Under ``--ref_mode_quirks``: has the reference's ``.eval()``
        latch engaged?  The reference's STCNN/AnoGAN ``test()`` switches the
        nets to eval mode and never back (lib/train_stcnn.py:143,
        models/anogan.py:145-147), so every training step after the FIRST
        periodic test runs without dropout and with frozen BN stats.  Our
        loop tests at step ``freq``, *after* that step's train update, so
        the latch holds from step ``freq + 1`` — derived from
        ``global_step`` so it survives resume without widening the
        checkpoint schema."""
        return self.cfg.ref_mode_quirks and self.global_step > self.cfg.freq

    # -- misc --------------------------------------------------------------
    def weight_path(self, name: str) -> str:
        return os.path.join(self.dirs.weights, name)
