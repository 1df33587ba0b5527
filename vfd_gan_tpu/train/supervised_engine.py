"""Supervised mask-prediction engine ("stcnn" path).

Capability rebuild of reference lib/train_stcnn.py:18-197: select one of
{c2plus1d, xception, clstm}, train with BCE(predict, gt) under Adam
(beta1 from config), run the periodic test sweep scoring morphology-opened
binary masks with pixel ROC/PR/F1, and checkpoint on best metric.

TPU-native structure: one jitted train step = on-device augmentation +
forward + loss + grads + Adam update, compiled once over a data-parallel
mesh (batch sharded on axis 0, params replicated — GSPMD inserts the
gradient all-reduce).  The periodic eval step is a second fixed-shape jit
(threshold + morphological opening on device).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from vfd_gan_tpu.models import build_mask_model
from vfd_gan_tpu.ops.augment import augment_clips, normalize_clips
from vfd_gan_tpu.ops.image import threshold
from vfd_gan_tpu.ops.losses import bce
from vfd_gan_tpu.ops.morphology import video_open
from vfd_gan_tpu.parallel.mesh import (accum_regroup, shard_batch,
                                        state_shardings)
from vfd_gan_tpu.train.checkpoints import save_checkpoint
from vfd_gan_tpu.train.engine_base import EngineBase, SweepAccumulator
from vfd_gan_tpu.train.state import NetState, make_adam


class SupervisedEngine(EngineBase):
    def __init__(self, cfg, train_iter, test_iter):
        super().__init__(cfg, train_iter, test_iter, gan=False)
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.model = build_mask_model(
            cfg.model, cfg, dtype,
            mesh=self.mesh if cfg.moe_shards > 1 else None)
        self.tx = make_adam(cfg.lr, cfg.beta1)

        # --pp: GPipe over Xception's middle-block chain (parallel/pp_xception);
        # state lives stage-stacked on the pp mesh axis, checkpoints stay
        # canonical via stack_state/unstack_state.
        self.pipe = None
        if cfg.pp > 1:
            from vfd_gan_tpu.parallel.pp_xception import XceptionPipeline
            self.pipe = XceptionPipeline(self.model, self.mesh, cfg.n_pp_micro)

        key = jax.random.key(cfg.seed)
        self.key, init_key = jax.random.split(key)

        def init_state(k):
            kp, kdrop = jax.random.split(k)
            sample = jnp.zeros((cfg.batchsize, cfg.nfr, cfg.isize, cfg.isize,
                                cfg.ich), jnp.float32)
            variables = self.model.init({"params": kp, "dropout": kdrop},
                                        sample, False)
            if self.pipe is not None:
                from vfd_gan_tpu.parallel.pp_xception import stack_middles
                variables = {
                    "params": stack_middles(variables["params"]),
                    "batch_stats": stack_middles(variables["batch_stats"])}
            return NetState.create(variables, self.tx)

        self.state = jax.jit(
            init_state, out_shardings=self._state_shardings(
                jax.eval_shape(init_state, init_key)))(init_key)

        if cfg.resume:
            if self.pipe is None:
                target = self.state
            else:
                from vfd_gan_tpu.parallel.pp_xception import unstack_state
                target = unstack_state(self.state)
            restored = self.restore_into(cfg.resume, {"state": target})
            state = restored["state"]
            if self.pipe is not None:
                from vfd_gan_tpu.parallel.pp_xception import stack_state
                state = stack_state(state)
            self.state = jax.device_put(state, self._state_shardings(state))
            print(f"\n Loaded pretrained weights from {cfg.resume}\n")

        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0,), static_argnums=(3,))
        self._eval_step = jax.jit(self._eval_step_impl)

    def _state_shardings(self, tree):
        if self.pipe is None:
            return state_shardings(self.mesh, tree)
        from vfd_gan_tpu.parallel.pp_xception import pp_state_shardings
        return pp_state_shardings(self.mesh, tree)

    # -- jitted steps ------------------------------------------------------
    def _train_step_impl(self, state: NetState, batch, key,
                         train_mode: bool = True):
        aug_key, drop_key = jax.random.split(key)
        data, real, gt = augment_clips(aug_key, batch["data"], batch["real"],
                                       batch["mask"], self.cfg.isize)

        def grads_fn(bstats, data_i, gt_i, key_i):
            def loss_fn(params):
                # train_mode=False is the --ref_mode_quirks stuck-in-eval
                # path: the reference's test() calls model.eval() and never
                # switches back (lib/train_stcnn.py:143), so post-first-test
                # training runs without dropout, normalising by FROZEN BN
                # running stats (gradients still flow; stats never update).
                if self.pipe is not None:
                    if train_mode:
                        pred, new_stats = self.pipe.apply_train(
                            params, bstats, data_i, key_i)
                    else:
                        pred = self.pipe.apply_eval(params, bstats, data_i)
                        new_stats = bstats
                elif train_mode:
                    pred, mut = self.model.apply(
                        {"params": params, "batch_stats": bstats},
                        data_i, True,
                        mutable=["batch_stats", "moe_aux"],
                        rngs={"dropout": key_i})
                    new_stats = mut["batch_stats"]
                else:
                    pred = self.model.apply(
                        {"params": params, "batch_stats": bstats},
                        data_i, False)
                    new_stats = bstats
                loss = bce(pred, gt_i)
                if train_mode and self.cfg.moe_experts:
                    # Switch load-balancing auxiliary (models/moe_block.py)
                    loss = loss + self.cfg.moe_aux_w * sum(
                        jnp.sum(v) for v in
                        jax.tree_util.tree_leaves(mut.get("moe_aux", {})))
                return loss, (pred, new_stats)

            return jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        k = self.cfg.accum
        if k <= 1:
            (loss, (pred, new_stats)), grads = grads_fn(
                state.batch_stats, data, gt, drop_key)
        else:
            # --accum: k sequential microbatches, averaged grads, ONE Adam
            # step; BN stats chain per microbatch (same contract as
            # MyGanEngine._gan_core_accum)
            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)

            def micro(carry, inp):
                bstats, gacc, lacc = carry
                data_i, gt_i, key_i = inp
                (loss_i, (pred_i, bstats)), grads_i = grads_fn(
                    bstats, data_i, gt_i, key_i)
                gacc = jax.tree_util.tree_map(jnp.add, gacc, grads_i)
                return (bstats, gacc, lacc + loss_i), pred_i

            (new_stats, gsum, lsum), preds = jax.lax.scan(
                micro,
                (state.batch_stats, zero, jnp.float32(0.0)),
                (accum_regroup(self.mesh, data, k),
                 accum_regroup(self.mesh, gt, k),
                 jax.random.split(drop_key, k)))
            grads = jax.tree_util.tree_map(lambda x: x / k, gsum)
            loss = lsum / k
            pred = preds.reshape((-1,) + preds.shape[2:])
        state = state.apply_grads(self.tx, grads, new_stats)

        # summary-only t_pre/m_pre live in EngineBase.viz_morphology, not the
        # hot step (computed every cfg.freq steps instead of every step)
        viz = {"data": data, "real": real, "gt": gt, "pred": pred}
        return state, loss, viz

    def _eval_step_impl(self, state: NetState, batch):
        data, real, gt = normalize_clips(batch["data"], batch["real"],
                                         batch["mask"])
        if self.pipe is not None:
            pred = self.pipe.apply_eval(state.params, state.batch_stats, data)
        else:
            pred = self.model.apply(state.variables(), data, False)
        m_pre = video_open(threshold(pred), self.cfg.morph_plane)
        return bce(pred, gt), gt, pred, m_pre, data, real

    # -- loops -------------------------------------------------------------
    def _do_train_step(self, sharded, step_key):
        self.state, loss, viz = self._train_step(self.state, sharded,
                                                 step_key,
                                                 not self.stuck_in_eval)
        return {"loss/err/train": loss}, viz

    def _update_train_videos(self, viz) -> None:
        t_pre, m_pre = self.viz_morphology(viz["pred"])
        d = {k: np.asarray(v) for k, v in viz.items()}
        d["t_pre"], d["m_pre"] = np.asarray(t_pre), np.asarray(m_pre)
        self.color_videos["train/input-real"] = np.concatenate(
            [d["data"], d["real"]], axis=2)
        self.gray_videos["train/gt-pre-th-mor"] = np.concatenate(
            [d["gt"], d["pred"], d["t_pre"], d["m_pre"]], axis=2)

    def test(self) -> tuple[float, float, float]:
        sweep = SweepAccumulator(device=self.cfg.device_scoring)
        for batch in self.test_iter:
            sharded = shard_batch(self.mesh, batch)
            err, gt, pred, m_pre, data, real = self._eval_step(self.state,
                                                               sharded)
            # scored prediction = morphology-opened binary mask
            # (lib/train_stcnn.py:158-162)
            sweep.add(gt, m_pre, {"loss/err/test": err})
            if self.summary.enabled:
                self.color_videos["test/input-real"] = np.concatenate(
                    [np.asarray(data), np.asarray(real)], axis=2)
                self.gray_videos["test/mask-pre-th-mor"] = np.concatenate(
                    [np.asarray(gt), np.asarray(pred),
                     np.asarray(threshold(pred)), np.asarray(m_pre)], axis=2)

        roc, pr, f1 = self.score_and_checkpoint(
            sweep.gts, sweep.preds, self._save_weights)
        self.errors.update(sweep.mean_metrics())
        return roc, pr, f1

    def _ckpt_tree(self):
        state = self.state
        if self.pipe is not None:
            # checkpoints stay in the canonical middle1..middle8 layout so
            # pp and non-pp runs (and the .pth converters) interchange
            from vfd_gan_tpu.parallel.pp_xception import unstack_state
            state = unstack_state(state)
        return {"state": state, "step": self.global_step,
                "loop": self._loop_state()}

    def _save_weights(self, head: str) -> None:
        name = f"{head}-{self.best_roc if head == 'roc' else self.best_pr:.4f}" \
               f"_step{self.global_step:04d}"
        save_checkpoint(self.weight_path(name), self._ckpt_tree())
