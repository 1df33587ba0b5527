"""GANomaly training engine — frame-level enc-dec-enc anomaly detection.

The reference ships GANomaly as dead code (broken imports,
models/ganomaly.py:18-20; trainer branch commented out, trainer.py:25-27)
but BASELINE.json lists its enc-dec-enc scoring as a target config, so this
engine implements the capability natively, following the canonical GANomaly
training scheme the vendored copy documents:

* G loss = w_adv * l2(D_feat(real), D_feat(fake))
         + w_con * L1(real, fake)
         + w_enc * l2(z_in, z_out)        (models/ganomaly.py:160-175)
* D loss = BCE(D(real), 1) + BCE(D(fake detached), 0)
* anomaly score per frame = mean((z_in - z_out)^2), min-max normalised over
  the evaluation sweep (models/ganomaly.py:372,396); frame-level AUC against
  the per-frame clip labels.

Video clips are folded to ``(B*T, H, W, C)`` frame batches — the model is
2-D per frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vfd_gan_tpu.models.ganomaly import (
    GanomalyDiscriminator,
    GanomalyGenerator,
    ganomaly_anomaly_score,
)
from vfd_gan_tpu.ops.augment import augment_clips, normalize_clips
from vfd_gan_tpu.ops.losses import bce, l2_loss
from vfd_gan_tpu.parallel.mesh import shard_batch, state_shardings
from vfd_gan_tpu.train.checkpoints import save_checkpoint
from vfd_gan_tpu.train.engine_base import EngineBase
from vfd_gan_tpu.train.state import NetState, make_adam

W_ENC = 1.0  # latent reconstruction weight (GANomaly's default)


def _fold(video):
    """(B, T, H, W, C) -> (B*T, H, W, C)."""
    b, t, h, w, c = video.shape
    return video.reshape(b * t, h, w, c)


class GanomalyEngine(EngineBase):
    def __init__(self, cfg, train_iter, test_iter):
        super().__init__(cfg, train_iter, test_iter, gan=True)
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.netg = GanomalyGenerator(isize=cfg.isize, dtype=dtype)
        self.netd = GanomalyDiscriminator(isize=cfg.isize, dtype=dtype)
        self.tx_g = make_adam(cfg.lr, cfg.beta1)
        self.tx_d = make_adam(cfg.lr, cfg.beta1)

        key = jax.random.key(cfg.seed)
        self.key, init_key = jax.random.split(key)

        def init_states(k):
            kg, kd = jax.random.split(k)
            frames = jnp.zeros((cfg.batchsize * cfg.nfr, cfg.isize,
                                cfg.isize, cfg.ich), jnp.float32)
            return (NetState.create(self.netg.init({"params": kg}, frames,
                                                   False), self.tx_g),
                    NetState.create(self.netd.init({"params": kd}, frames,
                                                   False), self.tx_d))

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

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------
    def _train_step_impl(self, g_state: NetState, d_state: NetState, batch,
                         key):
        cfg = self.cfg
        aug_key, _ = jax.random.split(key)
        data, real, _ = augment_clips(aug_key, batch["data"], batch["real"],
                                      batch["mask"], cfg.isize)
        frames = _fold(data)
        n = frames.shape[0]
        ones, zeros = jnp.ones((n,), jnp.float32), jnp.zeros((n,), jnp.float32)

        # ---- G step ----
        def g_loss_fn(g_params):
            (fake, z_in, z_out), mut = self.netg.apply(
                {"params": g_params, "batch_stats": g_state.batch_stats},
                frames, True, mutable=["batch_stats"])
            _, feat_real = self.netd.apply(d_state.variables(), frames, False)
            _, feat_fake = self.netd.apply(d_state.variables(), fake, False)
            err_adv = l2_loss(feat_real.astype(jnp.float32),
                              feat_fake.astype(jnp.float32))
            err_con = jnp.mean(jnp.abs(fake - frames))
            err_enc = l2_loss(z_in, z_out)
            loss = (err_adv * cfg.w_adv + err_con * cfg.w_con
                    + err_enc * W_ENC)
            aux = {"g/err_g_adv/train": err_adv, "g/err_g_con/train": err_con,
                   "g/err_g_enc/train": err_enc, "g/err_g/train": loss}
            return loss, (fake, mut["batch_stats"], aux)

        (_, (fake, g_stats, g_aux)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_state.params)
        g_state = g_state.apply_grads(self.tx_g, g_grads, g_stats)
        fake_sg = jax.lax.stop_gradient(fake)

        # ---- D step ----
        def d_loss_fn(d_params):
            (s_real, _), mut = self.netd.apply(
                {"params": d_params, "batch_stats": d_state.batch_stats},
                frames, True, mutable=["batch_stats"])
            (s_fake, _), mut = self.netd.apply(
                {"params": d_params, "batch_stats": mut["batch_stats"]},
                fake_sg, True, mutable=["batch_stats"])
            loss = bce(s_real, ones) + bce(s_fake, zeros)
            return loss, (mut["batch_stats"],)

        (d_loss, (d_stats,)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_state.params)
        d_state = d_state.apply_grads(self.tx_d, d_grads, d_stats)

        metrics = dict(g_aux)
        metrics["d/err_d/train"] = d_loss
        viz = {"input": data, "real": real,
               "gen": fake_sg.reshape(data.shape)}
        return g_state, d_state, metrics, viz

    def _eval_step_impl(self, g_state: NetState, batch):
        data, _, _ = normalize_clips(batch["data"], batch["real"],
                                     batch["mask"])
        frames = _fold(data)
        fake, z_in, z_out = self.netg.apply(g_state.variables(), frames,
                                            False)
        scores = ganomaly_anomaly_score(z_in, z_out)
        return scores.reshape(data.shape[:2]), fake.reshape(data.shape)

    # ------------------------------------------------------------------
    def _do_train_step(self, sharded, step_key):
        self.g_state, self.d_state, metrics, viz = self._train_step(
            self.g_state, self.d_state, sharded, step_key)
        return metrics, viz

    def _update_train_videos(self, viz) -> None:
        d = {k: np.asarray(v) for k, v in viz.items()}
        self.color_videos["train/input-real-gen"] = np.concatenate(
            [d["input"], d["real"], d["gen"]], axis=2)

    def test(self) -> float:
        """Frame-level AUC with min-max score normalisation over the sweep
        (models/ganomaly.py:372-399)."""
        all_scores, all_labels = [], []
        for batch in self.test_iter:
            sharded = shard_batch(self.mesh, batch)
            scores, _ = self._eval_step(self.g_state, sharded)
            all_scores.append(np.asarray(scores).ravel())
            all_labels.append(np.asarray(batch["label"]).ravel())
        if not all_scores:
            print(" >> test sweep produced no batches "
                  "(empty/short test split); scores are NaN")
            self.scores["score/roc"] = float("nan")
            return float("nan")
        scores = np.concatenate(all_scores)
        labels = np.concatenate(all_labels)
        lo, hi = scores.min(), scores.max()
        scores = (scores - lo) / (hi - lo + 1e-12)

        from vfd_gan_tpu.eval.metrics import evaluate
        if len(np.unique(labels)) < 2:
            roc = 0.0  # degenerate split (no anomalies)
        else:
            roc = evaluate(labels, scores, self.best_roc, self.epoch,
                           self.dirs.root, metric="roc")
        if roc > self.best_roc:
            self.best_roc = roc
            self._save_weights("roc")
        self.scores["score/roc"] = roc
        return roc

    def _ckpt_tree(self):
        return {"netG": self.g_state, "netD": self.d_state,
                "step": self.global_step, "loop": self._loop_state()}

    def _save_weights(self, head: str) -> None:
        save_checkpoint(self.weight_path(f"{head}_ep{self.epoch:04d}"),
                        self._ckpt_tree())
