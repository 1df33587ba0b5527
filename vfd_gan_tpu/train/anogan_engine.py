"""AnoGAN training engine — DCGAN alternating updates + |G(z)-x| scoring.

Capability rebuild of reference models/anogan.py:121-266:

* D step first: BCE(D(real), 1) + BCE(D(G(z)) with z ~ N(0,1)^100, 0);
  G output detached for the D update (anogan.py:231-243).
* G step second, using the *updated* D (the reference calls d_opt.step()
  before G's backward, anogan.py:243-250): BCE(D(G(z)), 1).
* G's learning rate is 5x D's (anogan.py:139-140).
* Forgery prediction = per-time-slab min-max normalised |G(z) - real|,
  grayscaled (predict_forg, anogan.py:24-37) — computed on device here.
* Test sweep scores the *raw* normalised difference heat-map (not the
  morphologised mask — anogan.py:184-185 appends ``predict_``), with
  threshold+morphology still computed for the video summaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vfd_gan_tpu.models.anogan import AnoDiscriminator, AnoGenerator, Z_DIM
from vfd_gan_tpu.ops.augment import augment_clips, normalize_clips
from vfd_gan_tpu.ops.image import minmax_normalize, rgb_to_gray, threshold
from vfd_gan_tpu.ops.losses import bce
from vfd_gan_tpu.ops.morphology import video_open
from vfd_gan_tpu.parallel.mesh import shard_batch, state_shardings
from vfd_gan_tpu.train.checkpoints import save_checkpoint
from vfd_gan_tpu.train.engine_base import EngineBase, SweepAccumulator
from vfd_gan_tpu.train.state import NetState, make_adam


def predict_forgery(fake, real):
    """|G(z) - real| -> per-time-slab min-max normalise -> grayscale
    (reference predict_forg, anogan.py:24-37).  Channel-last videos."""
    diff = jnp.abs(fake - real)
    # normalise each time slab across (B, H, W, C) jointly, like
    # ``normalize(v) for v in diff.permute(2, 0, 1, 3, 4)``
    norm = jnp.moveaxis(
        jax.vmap(minmax_normalize)(jnp.moveaxis(diff, 1, 0)), 0, 1)
    return rgb_to_gray(norm)


class AnoGanEngine(EngineBase):
    def __init__(self, cfg, train_iter, test_iter):
        super().__init__(cfg, train_iter, test_iter, gan=True)
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.netg = AnoGenerator(nfr=cfg.nfr, isize=cfg.isize, dtype=dtype)
        self.netd = AnoDiscriminator(dtype=dtype)
        # G lr = 5x D lr (anogan.py:139-140); both beta1=0.5 fixed.
        self.tx_g = make_adam(5 * cfg.lr, 0.5)
        self.tx_d = make_adam(cfg.lr, 0.5)

        key = jax.random.key(cfg.seed)
        self.key, init_key = jax.random.split(key)

        def init_states(k):
            kg, kd, kdrop = jax.random.split(k, 3)
            z = jnp.zeros((cfg.batchsize, Z_DIM), jnp.float32)
            video = jnp.zeros((cfg.batchsize, cfg.nfr, cfg.isize, cfg.isize,
                               3), jnp.float32)
            g_vars = self.netg.init({"params": kg, "dropout": kdrop}, z, False)
            d_vars = self.netd.init({"params": kd}, video, False)
            return (NetState.create(g_vars, self.tx_g),
                    NetState.create(d_vars, self.tx_d))

        self.g_state, self.d_state = jax.jit(
            init_states, out_shardings=state_shardings(
                self.mesh, jax.eval_shape(init_states, init_key)))(init_key)

        if cfg.resume:
            restored = self.restore_into(
                cfg.resume, {"netG": self.g_state, "netD": self.d_state})
            self.g_state = jax.device_put(
                restored["netG"], state_shardings(self.mesh, restored["netG"]))
            self.d_state = jax.device_put(
                restored["netD"], state_shardings(self.mesh, restored["netD"]))

        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0, 1),
                                   static_argnums=(4,))
        self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------
    def _train_step_impl(self, g_state: NetState, d_state: NetState, batch,
                         key, train_mode: bool = True):
        cfg = self.cfg
        aug_key, z_key, drop_key = jax.random.split(key, 3)
        data, real, gt = augment_clips(aug_key, batch["data"], batch["real"],
                                       batch["mask"], cfg.isize)
        z = jax.random.normal(z_key, (data.shape[0], Z_DIM), jnp.float32)
        g_state, d_state, fake_sg, metrics = self._ano_core(
            g_state, d_state, real, z, drop_key, train_mode)
        pred = predict_forgery(fake_sg, real)
        # summary-only t_pre/m_pre move to EngineBase.viz_morphology (the
        # eval step keeps them inline — there they feed every sweep batch's
        # viz panel, and eval already runs only at summary cadence)
        viz = {"input": data, "real": real, "gen": fake_sg, "gt": gt,
               "pred": pred}
        return g_state, d_state, metrics, viz

    def _ano_core(self, g_state: NetState, d_state: NetState, real, z,
                  drop_key, train_mode: bool = True):
        """One alternating update from post-augment inputs (the reference's
        optimize_params, anogan.py:229-250); golden-parity-tested against it
        in tests/test_anogan_step_parity.py.

        ``train_mode=False`` is the ``--ref_mode_quirks`` stuck-in-eval
        path: the reference's test() switches netg/netd to eval mode and
        never back (models/anogan.py:145-147), so post-first-test training
        runs without dropout, normalising by FROZEN BN running stats — the
        optimisers still step, but none of the three per-step BN stat
        mutations happen."""
        b = real.shape[0]
        ones, zeros = jnp.ones((b,), jnp.float32), jnp.zeros((b,), jnp.float32)

        def g_fwd(g_params):
            if train_mode:
                return self.netg.apply(
                    {"params": g_params,
                     "batch_stats": g_state.batch_stats},
                    z, True, mutable=["batch_stats"],
                    rngs={"dropout": drop_key})
            return (self.netg.apply(
                {"params": g_params, "batch_stats": g_state.batch_stats},
                z, False), {"batch_stats": g_state.batch_stats})

        def d_fwd(d_params, bstats, video):
            if train_mode:
                (score, feat), mut = self.netd.apply(
                    {"params": d_params, "batch_stats": bstats},
                    video, True, mutable=["batch_stats"])
                return score, mut["batch_stats"]
            score, _feat = self.netd.apply(
                {"params": d_params, "batch_stats": bstats}, video, False)
            return score, bstats

        # G forward once; its output feeds both updates (anogan.py:237-247).
        fake, g_mut = g_fwd(g_state.params)
        fake_sg = jax.lax.stop_gradient(fake)

        # ---- D step (real -> 1, detached fake -> 0) ----
        def d_loss_fn(d_params):
            s_real, bstats = d_fwd(d_params, d_state.batch_stats, real)
            loss_real = bce(s_real, ones)
            s_fake, bstats = d_fwd(d_params, bstats, fake_sg)
            loss_fake = bce(s_fake, zeros)
            return loss_real + loss_fake, (bstats,)

        (d_loss, (d_stats,)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_state.params)
        d_state = d_state.apply_grads(self.tx_d, d_grads, d_stats)

        # ---- G step against the UPDATED D (anogan.py:243-250).  The
        # reference's fresh netd(gen_fake) forward also mutates D's BN
        # running stats a third time this step — keep that mutation.
        def g_loss_fn(g_params):
            fk, mut = g_fwd(g_params)
            s_fake, d_bstats = d_fwd(d_state.params, d_state.batch_stats, fk)
            return bce(s_fake, ones), (mut["batch_stats"], d_bstats)

        (g_loss, (g_stats, d_stats_g)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_state.params)
        g_state = g_state.apply_grads(self.tx_g, g_grads, g_stats)
        d_state = d_state.replace(batch_stats=d_stats_g)

        metrics = {"d/err_d/train": d_loss, "g/err_g/train": g_loss}
        return g_state, d_state, fake_sg, metrics

    def _eval_step_impl(self, g_state: NetState, d_state: NetState, batch,
                        key):
        data, real, gt = normalize_clips(batch["data"], batch["real"],
                                         batch["mask"])
        b = data.shape[0]
        ones, zeros = jnp.ones((b,), jnp.float32), jnp.zeros((b,), jnp.float32)
        z = jax.random.normal(key, (b, Z_DIM), jnp.float32)

        fake = self.netg.apply(g_state.variables(), z, False)
        s_real, _ = self.netd.apply(d_state.variables(), real, False)
        s_fake, _ = self.netd.apply(d_state.variables(), fake, False)

        pred = predict_forgery(fake, real)
        t_pre = threshold(pred)
        m_pre = video_open(t_pre, self.cfg.morph_plane)
        metrics = {
            "d/err_d/test": bce(s_real, ones) + bce(s_fake, zeros),
            "g/err_g/test": bce(s_fake, ones),
        }
        viz = {"input": data, "real": real, "gen": fake, "gt": gt,
               "pred": pred, "t_pre": t_pre, "m_pre": m_pre}
        return gt, pred, metrics, viz

    # ------------------------------------------------------------------
    def _do_train_step(self, sharded, step_key):
        self.g_state, self.d_state, metrics, viz = self._train_step(
            self.g_state, self.d_state, sharded, step_key,
            not self.stuck_in_eval)
        return metrics, viz

    def _update_train_videos(self, viz) -> None:
        t_pre, m_pre = self.viz_morphology(viz["pred"])
        d = {k: np.asarray(v) for k, v in viz.items()}
        d["t_pre"], d["m_pre"] = np.asarray(t_pre), np.asarray(m_pre)
        self.color_videos["train/input-real-gen"] = np.concatenate(
            [d["input"], d["real"], d["gen"]], axis=2)
        self.gray_videos["train/gt-pre-th-mor"] = np.concatenate(
            [d["gt"], d["pred"], d["t_pre"], d["m_pre"]], axis=2)

    def test(self) -> tuple[float, float, float]:
        sweep = SweepAccumulator(device=self.cfg.device_scoring)
        for batch in self.test_iter:
            self.key, step_key = jax.random.split(self.key)
            sharded = shard_batch(self.mesh, batch)
            gt, pred, metrics, viz = self._eval_step(self.g_state,
                                                     self.d_state, sharded,
                                                     step_key)
            # raw heat-map scored, not the morphologised mask
            # (anogan.py:184-185)
            sweep.add(gt, pred, metrics)
            if self.summary.enabled:
                d = {k: np.asarray(v) for k, v in viz.items()}
                self.color_videos["test/input-real-gen"] = np.concatenate(
                    [d["input"], d["real"], d["gen"]], axis=2)
                self.gray_videos["test/gt-pre-th-morph"] = np.concatenate(
                    [d["gt"], d["pred"], d["t_pre"], d["m_pre"]], axis=2)

        roc, pr, f1 = self.score_and_checkpoint(
            sweep.gts, sweep.preds, self._save_weights)
        self.errors.update(sweep.mean_metrics())
        return roc, pr, f1

    def _ckpt_tree(self):
        return {"netG": self.g_state, "netD": self.d_state,
                "step": self.global_step, "loop": self._loop_state()}

    def _save_weights(self, head: str) -> None:
        save_checkpoint(self.weight_path(f"{head}_ep{self.epoch:04d}"),
                        self._ckpt_tree())
