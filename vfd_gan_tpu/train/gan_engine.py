"""MyGAN training engine — the proposed model's adversarial training loop.

Capability rebuild of reference models/mygannet.py:216-475 +
lib/train_gan.py:59-85, as ONE fused jitted step per iteration:

  augment -> G forward -> on-device optical flow of (gt, predicted) mask
  videos -> D forward (real pair, fake pair) -> G grads -> D grads ->
  both Adam updates

Reference semantics preserved exactly:

* D consumes gray->RGB mask videos and their flow encodings, all *detached*
  (models/mygannet.py:279-286) — so the adversarial feature-matching term
  has no gradient path into G, and G learns from weighted BCE alone; the
  adv loss is telemetry.  We reproduce this with ``stop_gradient`` and keep
  the same loss decomposition in the logs.
* ``pos_weight`` quirk: the flag is parsed but overridden — l_con is
  ``weighted_bce`` at its default pos_weight=2 (models/mygannet.py:265-266).
* D loss: BCE real->1 / fake->0 averaged over both branches then halved
  (models/mygannet.py:323-332).
* Both optimisers are Adam(lr, (beta1, 0.999)) (models/mygannet.py:270-273).
* D BatchNorm sees real then fake sequentially (two stat updates per step).
* The reference applies G's update before computing D's backward, but from
  activations of the pre-update G — equivalent to computing both gradients
  from one forward, which is what the fused step does.
* Periodic test: predictions scored for AUC are the morphology-opened
  *binary* masks (models/mygannet.py:395-399); full G/D loss telemetry per
  batch; best-checkpoint rule if-roc-elif-pr saving paired G/D weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vfd_gan_tpu.models.mygan import DualDisc, Generator
from vfd_gan_tpu.models.stcnn import AutoEncoder
from vfd_gan_tpu.ops.augment import augment_clips, normalize_clips
from vfd_gan_tpu.ops.flow import video_to_flow_rgb
from vfd_gan_tpu.ops.image import gray2rgb, threshold
from vfd_gan_tpu.ops.losses import bce, l2_loss, weighted_bce
from vfd_gan_tpu.ops.morphology import video_open
from vfd_gan_tpu.parallel.mesh import (accum_regroup, shard_batch,
                                        state_shardings)
from vfd_gan_tpu.train.checkpoints import save_checkpoint
from vfd_gan_tpu.train.engine_base import EngineBase, SweepAccumulator
from vfd_gan_tpu.train.state import NetState, make_adam


class MyGanEngine(EngineBase):
    def __init__(self, cfg, train_iter, test_iter):
        super().__init__(cfg, train_iter, test_iter, gan=True)
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        if cfg.ae:
            print("\n --Using C2plus1d AutoEncoder as G-- ")
            self.netg = AutoEncoder(dtype=dtype)
        else:
            rblocks = tuple(b for b in cfg.remat_blocks.split(",") if b)
            self.netg = Generator(ngf=cfg.ngf, dtype=dtype, remat=cfg.remat,
                                  remat_blocks=rblocks)
        self.netd = DualDisc(ndf=cfg.ndf, dtype=dtype,
                             quant=cfg.int8_disc)
        self.tx_g = make_adam(cfg.lr, cfg.beta1)
        self.tx_d = make_adam(cfg.lr, cfg.beta1)

        key = jax.random.key(cfg.seed)
        self.key, init_key = jax.random.split(key)

        # One jitted init: a single compiled program instead of hundreds of
        # eagerly-dispatched ops (critical on remote/tunnelled devices).
        def init_states(k):
            kg, kd, kdrop = jax.random.split(k, 3)
            video = jnp.zeros((cfg.batchsize, cfg.nfr, cfg.isize, cfg.isize,
                               cfg.ich), jnp.float32)
            mask3 = jnp.zeros((cfg.batchsize, cfg.nfr, cfg.isize, cfg.isize,
                               3), jnp.float32)
            g_vars = self.netg.init({"params": kg, "dropout": kdrop}, video,
                                    False)
            d_vars = self.netd.init({"params": kd}, mask3, mask3, False)
            return (NetState.create(g_vars, self.tx_g),
                    NetState.create(d_vars, self.tx_d))

        # Replicated on dp/sp meshes; channel-sharded over a tp axis.
        shardings = state_shardings(self.mesh,
                                    jax.eval_shape(init_states, init_key))
        self.g_state, self.d_state = jax.jit(
            init_states, out_shardings=shardings)(init_key)

        if cfg.resume:
            restored = self.restore_into(
                cfg.resume, {"netG": self.g_state, "netD": self.d_state})
            self.g_state = jax.device_put(
                restored["netG"], state_shardings(self.mesh, restored["netG"]))
            self.d_state = jax.device_put(
                restored["netD"], state_shardings(self.mesh, restored["netD"]))
            print(f"\n Loaded pretrained G/D weights from {cfg.resume}\n")

        # parity-audit escape hatch: genuine cv2 flow on host (SURVEY.md §7)
        if cfg.host_flow:
            from vfd_gan_tpu.train.host_flow import video_to_flow_rgb_callback
            self._flow = video_to_flow_rgb_callback
        else:
            self._flow = lambda v, streams=1: video_to_flow_rgb(
                v, scale=cfg.flow_scale, streams=streams)

        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._eval_step_cached = jax.jit(self._eval_step_cached_impl)
        self._eval_step_quirk = jax.jit(self._eval_step_quirk_impl)
        # --cache_gt_flow: clip index -> device (T, H, W, 3) gt flow video
        self._gt_flow_cache: dict[int, jax.Array] = {}

    # ------------------------------------------------------------------
    def _disc_losses(self, d_params, d_stats, gt_3ch, gt_flow, pre_3ch,
                     pre_flow, train: bool):
        """Sequential real/fake D passes (matching the reference's two
        forward calls); returns scores, features, final BN stats."""
        if train:
            (s_r, sf_r, t_r, tf_r), mut = self.netd.apply(
                {"params": d_params, "batch_stats": d_stats},
                gt_3ch, gt_flow, True, mutable=["batch_stats"])
            (s_f, sf_f, t_f, tf_f), mut = self.netd.apply(
                {"params": d_params, "batch_stats": mut["batch_stats"]},
                pre_3ch, pre_flow, True, mutable=["batch_stats"])
            new_stats = mut["batch_stats"]
        else:
            s_r, sf_r, t_r, tf_r = self.netd.apply(
                {"params": d_params, "batch_stats": d_stats},
                gt_3ch, gt_flow, False)
            s_f, sf_f, t_f, tf_f = self.netd.apply(
                {"params": d_params, "batch_stats": d_stats},
                pre_3ch, pre_flow, False)
            new_stats = d_stats
        return (s_r, sf_r, t_r, tf_r), (s_f, sf_f, t_f, tf_f), new_stats

    def _train_step_impl(self, g_state: NetState, d_state: NetState, batch,
                         key):
        aug_key, drop_key = jax.random.split(key)
        data, real, gt = augment_clips(aug_key, batch["data"], batch["real"],
                                       batch["mask"], self.cfg.isize)
        if self.cfg.accum > 1:
            g_state, d_state, metrics, viz = self._gan_core_accum(
                g_state, d_state, data, gt, drop_key, self.cfg.accum)
        else:
            g_state, d_state, metrics, viz = self._gan_core(
                g_state, d_state, data, gt, drop_key)
        viz.update({"input": data, "real": real})
        return g_state, d_state, metrics, viz

    def _gan_core(self, g_state: NetState, d_state: NetState, data, gt,
                  drop_key):
        """The fused GAN step proper, on already-augmented inputs — the exact
        semantics of the reference's ``optimize_params``
        (models/mygannet.py:350-367: G forward, flows, two D passes, G then D
        backward+Adam).  Split from augmentation so the golden parity test
        (tests/test_gan_step_parity.py) can drive it on fixed inputs."""
        g_grads, d_grads, g_stats, d_stats, metrics, viz = self._gan_grads(
            g_state.params, g_state.batch_stats, d_state.params,
            d_state.batch_stats, data, gt, drop_key)
        g_state = g_state.apply_grads(self.tx_g, g_grads, g_stats)
        d_state = d_state.apply_grads(self.tx_d, d_grads, d_stats)
        return g_state, d_state, metrics, viz

    def _gan_core_accum(self, g_state: NetState, d_state: NetState, data,
                        gt, drop_key, k: int):
        """``--accum``: the fused step over ``k`` sequential microbatches
        (lax.scan), averaged gradients, ONE Adam step per network.

        BN batch statistics are computed per microbatch and the running
        stats chain through the scan — exactly the torch-user semantics of
        "run at batchsize/k, call optimizer.step() every k batches".
        Activation memory scales with the microbatch, so effective batches
        can exceed one chip's HBM.  No reference equivalent (extension)."""
        datas = accum_regroup(self.mesh, data, k)
        gts = accum_regroup(self.mesh, gt, k)
        keys = jax.random.split(drop_key, k)
        zero_g = jax.tree_util.tree_map(jnp.zeros_like, g_state.params)
        zero_d = jax.tree_util.tree_map(jnp.zeros_like, d_state.params)

        def micro(carry, inp):
            g_bs, d_bs, gacc, dacc = carry
            data_i, gt_i, key_i = inp
            g_gr, d_gr, g_bs, d_bs, metrics, viz = self._gan_grads(
                g_state.params, g_bs, d_state.params, d_bs, data_i, gt_i,
                key_i)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, g_gr)
            dacc = jax.tree_util.tree_map(jnp.add, dacc, d_gr)
            return (g_bs, d_bs, gacc, dacc), (metrics, viz)

        (g_bs, d_bs, gacc, dacc), (mstack, vstack) = jax.lax.scan(
            micro, (g_state.batch_stats, d_state.batch_stats, zero_g,
                    zero_d), (datas, gts, keys))

        inv_k = 1.0 / k
        g_grads = jax.tree_util.tree_map(lambda x: x * inv_k, gacc)
        d_grads = jax.tree_util.tree_map(lambda x: x * inv_k, dacc)
        metrics = {name: jnp.mean(v, axis=0) for name, v in mstack.items()}
        viz = {name: v.reshape((-1,) + v.shape[2:])
               for name, v in vstack.items()}
        g_state = g_state.apply_grads(self.tx_g, g_grads, g_bs)
        d_state = d_state.apply_grads(self.tx_d, d_grads, d_bs)
        return g_state, d_state, metrics, viz

    def _gan_grads(self, g_params, g_bstats, d_params, d_bstats, data, gt,
                   drop_key):
        """Gradients + chained BN stats + telemetry for one (micro)batch —
        the reference ``optimize_params`` semantics minus the optimiser
        applies (models/mygannet.py:350-367)."""
        cfg = self.cfg
        ones = jnp.ones((data.shape[0],), jnp.float32)
        zeros = jnp.zeros((data.shape[0],), jnp.float32)

        # ---- G forward + generator update (grads flow through l_con only,
        # matching the detached adv path, models/mygannet.py:279-312) ----
        def g_loss_fn(gp):
            pred, mut = self.netg.apply(
                {"params": gp, "batch_stats": g_bstats},
                data, True, mutable=["batch_stats"],
                rngs={"dropout": drop_key})
            # pos_weight quirk: fixed default 2 (models/mygannet.py:265-266)
            err_g_con = weighted_bce(pred, gt)
            return err_g_con * cfg.w_con, (pred, mut["batch_stats"])

        (g_con_scaled, (pred, g_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_params)

        # ---- flow + D inputs (all stop_gradient, models/mygannet.py:279-286)
        pred_sg = jax.lax.stop_gradient(pred)
        gt_3ch = gray2rgb(gt)
        pre_3ch = gray2rgb(pred_sg)
        # one batched flow computation for both videos; streams=2 keeps the
        # reference's per-video contrast stretch (models/mygannet.py:281-282)
        flows = self._flow(jnp.concatenate([gt_3ch, pre_3ch], axis=0),
                           streams=2)
        gt_flow, pre_flow = jnp.split(flows, 2, axis=0)

        # ---- D update ----
        def d_loss_fn(dp):
            real_out, fake_out, d_stats = self._disc_losses(
                dp, d_bstats, gt_3ch, gt_flow, pre_3ch,
                pre_flow, train=True)
            s_r, sf_r, t_r, tf_r = real_out
            s_f, sf_f, t_f, tf_f = fake_out
            err_d_real_s = bce(s_r, ones)
            err_d_real_t = bce(t_r, ones)
            err_d_fake_s = bce(s_f, zeros)
            err_d_fake_t = bce(t_f, zeros)
            err_d_real = (err_d_real_s + err_d_real_t) * 0.5
            err_d_fake = (err_d_fake_s + err_d_fake_t) * 0.5
            err_d = (err_d_real + err_d_fake) * 0.5
            aux = {
                "d/err_d_real_s/train": err_d_real_s,
                "d/err_d_real_t/train": err_d_real_t,
                "d/err_d_fake_s/train": err_d_fake_s,
                "d/err_d_fake_t/train": err_d_fake_t,
                "d/err_d_real/train": err_d_real,
                "d/err_d_fake/train": err_d_fake,
                "d/err_d/train": err_d,
            }
            return err_d, (aux, d_stats, (sf_r, tf_r, sf_f, tf_f))

        (_, (d_aux, d_stats, feats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_params)

        # adversarial telemetry (no G gradient by construction)
        sf_r, tf_r, sf_f, tf_f = feats
        err_g_adv_s = l2_loss(sf_r.astype(jnp.float32),
                              sf_f.astype(jnp.float32))
        err_g_adv_t = l2_loss(tf_r.astype(jnp.float32),
                              tf_f.astype(jnp.float32))
        err_g_adv = err_g_adv_s + err_g_adv_t
        err_g_con = g_con_scaled / cfg.w_con
        err_g = err_g_adv * cfg.w_adv + g_con_scaled

        metrics = dict(d_aux)
        metrics.update({
            "g/err_g/train": err_g,
            "g/err_g_adv/train": err_g_adv,
            "g/err_g_adv_s/train": err_g_adv_s,
            "g/err_g_adv_t/train": err_g_adv_t,
            "g/err_g_con/train": err_g_con,
        })

        # t_pre/m_pre (summary panels only) are deliberately NOT computed
        # here — EngineBase.viz_morphology derives them at summary cadence
        # (~10 ms/step saved, BENCH_NOTES.md).
        viz = {"gt": gt, "pred": pred_sg,
               "gt_flow": gt_flow, "pre_flow": pre_flow}
        return g_grads, d_grads, g_stats, d_stats, metrics, viz

    def _eval_step_impl(self, g_state: NetState, d_state: NetState, batch):
        """Periodic-test step (reference MyGAN.test body,
        models/mygannet.py:395-424).  Returns the gt-mask flow as a fifth
        output so ``test()`` can populate the ``--cache_gt_flow`` cache."""
        data, real, gt = normalize_clips(batch["data"], batch["real"],
                                         batch["mask"])
        pred = self.netg.apply(g_state.variables(), data, False)
        gt_3ch = gray2rgb(gt)
        pre_3ch = gray2rgb(pred)
        flows = self._flow(jnp.concatenate([gt_3ch, pre_3ch], axis=0),
                           streams=2)
        gt_flow, pre_flow = jnp.split(flows, 2, axis=0)
        out = self._eval_tail(d_state, data, real, gt, pred, gt_3ch, pre_3ch,
                              gt_flow, pre_flow)
        return out[:4] + (gt_flow,)

    def _eval_step_cached_impl(self, g_state: NetState, d_state: NetState,
                               batch, gt_flow_clips):
        """Periodic-test step reusing cached gt-mask flows (one per clip,
        stacked on device from the ``--cache_gt_flow`` cache).  The gt masks
        are static per clip, so their Farneback flow from the first sweep is
        reused and only the predicted-mask stream is recomputed — roughly
        halving the sweep's flow cost.  Near-exact: the reference's
        per-time-slab batch min-max (lib/utils.py:96) is the identity for
        binary Canny-edge gt slabs containing both values, so the cached
        flow is batch-composition-independent except for all-constant slabs
        (telemetry-only divergence, PARITY.md)."""
        data, real, gt = normalize_clips(batch["data"], batch["real"],
                                         batch["mask"])
        pred = self.netg.apply(g_state.variables(), data, False)
        gt_3ch = gray2rgb(gt)
        pre_3ch = gray2rgb(pred)
        gt_flow = jnp.stack(gt_flow_clips)
        pre_flow = self._flow(pre_3ch, streams=1)
        return self._eval_tail(d_state, data, real, gt, pred, gt_3ch,
                               pre_3ch, gt_flow, pre_flow)[:4]

    def _eval_tail(self, d_state: NetState, data, real, gt, pred, gt_3ch,
                   pre_3ch, gt_flow, pre_flow, train: bool = False):
        cfg = self.cfg
        ones = jnp.ones((data.shape[0],), jnp.float32)
        zeros = jnp.zeros((data.shape[0],), jnp.float32)
        t_pre = threshold(pred)
        m_pre = video_open(t_pre, self.cfg.morph_plane)

        # train=True is the --ref_mode_quirks path: D normalises by batch
        # stats and mutates its running stats twice, exactly like the
        # reference's never-.eval()'d test sweep (models/mygannet.py:400-409)
        real_out, fake_out, d_stats = self._disc_losses(
            d_state.params, d_state.batch_stats, gt_3ch, gt_flow, pre_3ch,
            pre_flow, train=train)
        s_r, sf_r, t_r, tf_r = real_out
        s_f, sf_f, t_f, tf_f = fake_out

        err_g_adv_s = l2_loss(sf_r.astype(jnp.float32), sf_f.astype(jnp.float32))
        err_g_adv_t = l2_loss(tf_r.astype(jnp.float32), tf_f.astype(jnp.float32))
        err_g_con = weighted_bce(pred, gt)
        err_d_real_s = bce(s_r, ones)
        err_d_real_t = bce(t_r, ones)
        err_d_fake_s = bce(s_f, zeros)
        err_d_fake_t = bce(t_f, zeros)
        metrics = {
            "g/err_g_adv_s/test": err_g_adv_s,
            "g/err_g_adv_t/test": err_g_adv_t,
            "g/err_g_adv/test": err_g_adv_s + err_g_adv_t,
            "g/err_g_con/test": err_g_con,
            # reference computes the combined test err_g from the *temporal*
            # adv term only (models/mygannet.py:416)
            "g/err_g/test": err_g_adv_t * cfg.w_adv + err_g_con * cfg.w_con,
            "d/err_d_real_s/test": err_d_real_s,
            "d/err_d_real_t/test": err_d_real_t,
            "d/err_d_fake_s/test": err_d_fake_s,
            "d/err_d_fake_t/test": err_d_fake_t,
        }
        metrics["d/err_d_real/test"] = (err_d_real_s + err_d_real_t) * 0.5
        metrics["d/err_d_fake/test"] = (err_d_fake_s + err_d_fake_t) * 0.5
        metrics["d/err_d/test"] = (metrics["d/err_d_real/test"]
                                   + metrics["d/err_d_fake/test"]) * 0.5
        viz = {"input": data, "real": real, "gt": gt, "pred": pred,
               "t_pre": t_pre, "m_pre": m_pre}
        return gt, m_pre, metrics, viz, d_stats

    def _eval_step_quirk_impl(self, g_state: NetState, d_state: NetState,
                              batch, key):
        """``--ref_mode_quirks`` periodic-test step: the reference's
        MyGAN.test never calls ``.eval()`` (models/mygannet.py:369-441), so
        G runs with dropout active and G/D BatchNorms normalise by batch
        statistics AND mutate their running stats during the sweep.
        Returns the updated G/D batch stats for the engine to fold back."""
        data, real, gt = normalize_clips(batch["data"], batch["real"],
                                         batch["mask"])
        pred, g_mut = self.netg.apply(
            {"params": g_state.params, "batch_stats": g_state.batch_stats},
            data, True, mutable=["batch_stats"], rngs={"dropout": key})
        gt_3ch = gray2rgb(gt)
        pre_3ch = gray2rgb(pred)
        flows = self._flow(jnp.concatenate([gt_3ch, pre_3ch], axis=0),
                           streams=2)
        gt_flow, pre_flow = jnp.split(flows, 2, axis=0)
        gt, m_pre, metrics, viz, d_stats = self._eval_tail(
            d_state, data, real, gt, pred, gt_3ch, pre_3ch, gt_flow,
            pre_flow, train=True)
        return gt, m_pre, metrics, viz, g_mut["batch_stats"], d_stats

    # ------------------------------------------------------------------
    def _do_train_step(self, sharded, step_key):
        self.g_state, self.d_state, metrics, viz = self._train_step(
            self.g_state, self.d_state, sharded, step_key)
        return metrics, viz

    def _update_train_videos(self, viz) -> None:
        t_pre, m_pre = self.viz_morphology(viz["pred"])
        d = {k: np.asarray(v) for k, v in viz.items()}
        d["t_pre"], d["m_pre"] = np.asarray(t_pre), np.asarray(m_pre)
        self.color_videos["train/input-real-inflow-genflow"] = np.concatenate(
            [d["input"], d["real"], d["gt_flow"], d["pre_flow"]], axis=2)
        self.gray_videos["train/gt-pre-th-morph"] = np.concatenate(
            [d["gt"], d["pred"], d["t_pre"], d["m_pre"]], axis=2)
        self.hists.update({f"train/{k}": d[k].ravel()
                           for k in ("input", "gt", "pred", "t_pre", "m_pre")})

    def test(self) -> tuple[float, float, float]:
        sweep = SweepAccumulator(device=self.cfg.device_scoring)
        for batch in self.test_iter:
            idx = batch.pop("index", None)
            sharded = shard_batch(self.mesh, batch)
            if self.cfg.ref_mode_quirks:
                # fidelity mode: G/D stay in train mode through the sweep
                # (dropout on, BN batch-stat normalisation + running-stat
                # mutation carried back into training) — the gt-flow cache
                # is bypassed to keep the path reference-exact
                self.key, qk = jax.random.split(self.key)
                gt, m_pre, metrics, viz, g_stats, d_stats = \
                    self._eval_step_quirk(self.g_state, self.d_state,
                                          sharded, qk)
                self.g_state = self.g_state.replace(batch_stats=g_stats)
                self.d_state = self.d_state.replace(batch_stats=d_stats)
                sweep.add(gt, m_pre, metrics)
                if self.summary.enabled:
                    d = {k: np.asarray(v) for k, v in viz.items()}
                    self.color_videos["test/input-real"] = np.concatenate(
                        [d["input"], d["real"]], axis=2)
                    self.gray_videos["test/gt-pre-th-morph"] = np.concatenate(
                        [d["gt"], d["pred"], d["t_pre"], d["m_pre"]], axis=2)
                continue
            caching = self.cfg.cache_gt_flow and idx is not None
            if caching and all(int(i) in self._gt_flow_cache for i in idx):
                # gt flows from earlier sweeps, stacked inside the jit (no
                # eager tunnel round trips)
                gt, m_pre, metrics, viz = self._eval_step_cached(
                    self.g_state, self.d_state, sharded,
                    tuple(self._gt_flow_cache[int(i)] for i in idx))
            else:
                gt, m_pre, metrics, viz, gt_flow = self._eval_step(
                    self.g_state, self.d_state, sharded)
                if caching:
                    for j, i in enumerate(idx):
                        self._gt_flow_cache[int(i)] = gt_flow[j]
            sweep.add(gt, m_pre, metrics)
            if self.summary.enabled:
                # TB-only panels: skip the bulk device->host viz fetch when
                # summaries are off (the sweep still fetches gt/m_pre above)
                d = {k: np.asarray(v) for k, v in viz.items()}
                self.color_videos["test/input-real"] = np.concatenate(
                    [d["input"], d["real"]], axis=2)
                self.gray_videos["test/gt-pre-th-morph"] = np.concatenate(
                    [d["gt"], d["pred"], d["t_pre"], d["m_pre"]], axis=2)

        roc, pr, f1 = self.score_and_checkpoint(
            sweep.gts, sweep.preds, self._save_weights)
        self.errors.update(sweep.mean_metrics())
        return roc, pr, f1

    # ------------------------------------------------------------------
    def reinit_d(self) -> None:
        """Re-randomise the discriminator (reference reinit_d,
        models/mygannet.py:346-348 — a collapse-recovery hook)."""
        self.key, kd = jax.random.split(self.key)
        cfg = self.cfg
        mask3 = jnp.zeros((cfg.batchsize, cfg.nfr, cfg.isize, cfg.isize, 3),
                          jnp.float32)

        def init_d(k):
            d_vars = self.netd.init({"params": k}, mask3, mask3, False)
            return NetState.create(d_vars, self.tx_d)

        self.d_state = jax.jit(
            init_d, out_shardings=state_shardings(
                self.mesh, jax.eval_shape(init_d, kd)))(kd)
        print("Reloading Net d")

    # ------------------------------------------------------------------
    def _ckpt_tree(self):
        return {"netG": self.g_state, "netD": self.d_state,
                "step": self.global_step, "loop": self._loop_state()}

    def _save_weights(self, head: str) -> None:
        name = f"{head}_ep{self.epoch:04d}"
        save_checkpoint(self.weight_path(name), self._ckpt_tree())
