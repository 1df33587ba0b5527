"""Golden one-step GAN parity vs the reference's ``optimize_params``.

Replicates models/mygannet.py:350-367 on torch CPU — G forward, flow-encoded
D inputs, sequential real/fake D passes, G backward+Adam then D
backward+Adam — from the reference's own NetG/NetD modules, and compares the
updated G and D parameters, D BatchNorm running statistics, and the full
loss telemetry against one ``MyGanEngine._gan_core`` step from identical
weights (VERDICT.md round-1 Weak #5).

Determinism: dropout is zeroed on both sides (reference fixes p=0.25,
models/mygannet.py:49; our ``Generator.drop_rate=0``), and the optical-flow
videos — which both sides derive from the *same* detached prediction through
the same cv2 pipeline (lib/utils.py:94-129 == train/host_flow.py, pinned by
tests/test_host_flow.py) — are computed once and injected into both steps so
uint8-rounding noise cannot leak into the comparison.
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_torch_parity import _np_sd  # noqa: E402

from vfd_gan_tpu.config import Config  # noqa: E402
from vfd_gan_tpu.models.mygan import Generator  # noqa: E402
from vfd_gan_tpu.train.host_flow import host_video_to_flow_rgb  # noqa: E402
from vfd_gan_tpu.train.state import NetState  # noqa: E402
from vfd_gan_tpu.utils.torch_compat import (  # noqa: E402
    mygan_dualdisc_from_torch,
    mygan_generator_from_torch,
)

LR = 2e-5
W_ADV, W_CON = 1.0, 10.0


def _weighted_bce_torch(pred, target, pos_weight=2.0):
    """lib/utils.py:65-71 (weight on the *negative* term — quirk)."""
    p = torch.clamp(pred, min=1e-8, max=1 - 1e-8)
    loss = target * torch.log(p) + pos_weight * (1 - target) * torch.log(1 - p)
    return torch.neg(torch.mean(loss))


def _l2_loss_torch(a, b):
    """lib/utils.py:59-63."""
    return torch.mean(torch.pow(a - b, 2))


def test_one_gan_step_matches_reference(ref_modules, tmp_path):
    torch.manual_seed(42)
    # the reference NetD hardcodes isize=128 Linear shapes (mygannet.py:160)
    B, T, S = 1, 16, 128
    args = types.SimpleNamespace(nfr=T, isize=S)
    ref_g = ref_modules.mygan.NetG().train()
    ref_d = ref_modules.mygan.NetD(args).train()
    ref_g.dropout.p = 0.0  # determinism (models/mygannet.py:49)

    # _np_sd returns views of the live torch tensors — copy, or the in-place
    # Adam step below silently rewrites the "initial" weights
    sd_g0 = {k: v.copy() for k, v in _np_sd(ref_g).items()}
    sd_d0 = {k: v.copy() for k, v in _np_sd(ref_d).items()}

    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (B, 3, T, S, S)).astype(np.float32)
    gt = (rng.uniform(size=(B, 1, T, S, S)) > 0.85).astype(np.float32)

    # ---- torch replication of optimize_params (mygannet.py:350-367) ----
    opt_g = torch.optim.Adam(ref_g.parameters(), lr=LR, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(ref_d.parameters(), lr=LR, betas=(0.5, 0.999))

    xt, gtt = torch.from_numpy(x), torch.from_numpy(gt)
    pred = ref_g(xt)                                   # forward_g
    pre_3ch = torch.cat([pred.detach()] * 3, dim=1)    # gray2rgb
    gt_3ch = torch.cat([gtt] * 3, dim=1)

    # flow computed ONCE (cv2 pipeline == reference video_to_flow) and
    # shared verbatim with our step below
    def _flow_np(video_bc3thw):
        v = video_bc3thw.detach().numpy().transpose(0, 2, 3, 4, 1)
        return host_video_to_flow_rgb(v)               # (B,T,H,W,3) [-1,1]

    gt_flow_np = _flow_np(gt_3ch)
    pre_flow_np = _flow_np(pre_3ch)
    gt_flow = torch.from_numpy(gt_flow_np.transpose(0, 4, 1, 2, 3))
    pre_flow = torch.from_numpy(pre_flow_np.transpose(0, 4, 1, 2, 3))

    # forward_d: sequential real then fake passes (mygannet.py:279-286)
    s_pr, s_fr, t_pr, t_fr = ref_d(gt_3ch, gt_flow)
    s_pf, s_ff, t_pf, t_ff = ref_d(pre_3ch, pre_flow)

    # backward_g (mygannet.py:305-312): adv terms are detached features
    opt_g.zero_grad()
    err_g_adv_s = _l2_loss_torch(s_fr, s_ff)
    err_g_adv_t = _l2_loss_torch(t_fr, t_ff)
    err_g_con = _weighted_bce_torch(pred, gtt)
    err_g = (err_g_adv_s + err_g_adv_t) * W_ADV + err_g_con * W_CON
    err_g.backward(retain_graph=True)
    opt_g.step()

    # backward_d (mygannet.py:324-345)
    opt_d.zero_grad()
    ones = torch.ones(B)
    zeros = torch.zeros(B)
    bce = torch.nn.BCELoss()
    err_d_real = (bce(s_pr, ones) + bce(t_pr, ones)) * 0.5
    err_d_fake = (bce(s_pf, zeros) + bce(t_pf, zeros)) * 0.5
    err_d = (err_d_real + err_d_fake) * 0.5
    err_d.backward()
    opt_d.step()

    # ---- our fused step from the same weights ----
    from vfd_gan_tpu.train.gan_engine import MyGanEngine

    cfg = Config(model="mygan", isize=S, nfr=T, batchsize=B, ep=1,
                 lr=LR, w_adv=W_ADV, w_con=W_CON, result_root=str(tmp_path),
                 tensorboard=False, compute_dtype="float32",
                 tr_plist="", ts_plist="").validate()
    eng = MyGanEngine(cfg, None, None)
    eng.netg = Generator(ngf=32, dtype=jnp.float32, drop_rate=0.0)
    eng.g_state = NetState.create(
        jax.tree_util.tree_map(jnp.asarray,
                               mygan_generator_from_torch(sd_g0)), eng.tx_g)
    eng.d_state = NetState.create(
        jax.tree_util.tree_map(jnp.asarray,
                               mygan_dualdisc_from_torch(sd_d0)), eng.tx_d)
    # inject the shared flow videos (both streams, concatenated)
    shared = jnp.asarray(np.concatenate([gt_flow_np, pre_flow_np], axis=0))
    eng._flow = lambda v, streams=1: shared

    data = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    gtj = jnp.asarray(gt.transpose(0, 2, 3, 4, 1))
    g_state, d_state, metrics, _ = eng._gan_core(
        eng.g_state, eng.d_state, data, gtj, jax.random.key(0))
    eng.close()

    # ---- loss telemetry parity ----
    np.testing.assert_allclose(float(metrics["g/err_g_con/train"]),
                               float(err_g_con), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["g/err_g_adv_s/train"]),
                               float(err_g_adv_s), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(metrics["g/err_g_adv_t/train"]),
                               float(err_g_adv_t), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(metrics["d/err_d/train"]),
                               float(err_d), rtol=1e-5)

    # ---- updated parameters parity (through the same converters) ----
    # Adam's first step moves every weight by ~+-LR regardless of gradient
    # magnitude, so where the true gradient is ~0 (e.g. conv biases that the
    # following BatchNorm's mean-subtraction makes loss-invariant)
    # cross-framework float noise can flip the update's sign — a +-2*LR
    # difference carrying no information.  Semantic bugs flip signs
    # *broadly*, so bound every element by the sign-flip envelope and
    # additionally require almost all elements to match tightly.
    def assert_step_parity(want_params, got_params, what):
        flat_want = jax.tree_util.tree_flatten_with_path(want_params)[0]
        flat_got = dict(jax.tree_util.tree_flatten_with_path(got_params)[0])
        assert flat_want and len(flat_want) == len(flat_got), what
        total = loose = 0
        for path, w in flat_want:
            d = np.abs(np.asarray(flat_got[path]) - w)
            assert d.max() <= 2.5 * LR, (what, path, float(d.max()))
            total += d.size
            loose += int((d > 5e-6).sum())
        assert loose / total < 0.02, (what, loose, total)

    want_g = mygan_generator_from_torch(_np_sd(ref_g))["params"]
    assert_step_parity(want_g, jax.device_get(g_state.params), "netG")

    want_d_all = mygan_dualdisc_from_torch(_np_sd(ref_d))
    assert_step_parity(want_d_all["params"],
                       jax.device_get(d_state.params), "netD")

    # ---- D BatchNorm running stats after the two sequential passes ----
    got_stats = jax.device_get(d_state.batch_stats)
    flat_want = jax.tree_util.tree_flatten_with_path(
        want_d_all["batch_stats"])[0]
    flat_got = dict(jax.tree_util.tree_flatten_with_path(got_stats)[0])
    assert flat_want and len(flat_want) == len(flat_got)
    for path, w in flat_want:
        np.testing.assert_allclose(flat_got[path], w, atol=1e-5,
                                   err_msg=str(path))
