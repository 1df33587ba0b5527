"""Golden one-step training parity vs the reference (torch CPU).

Loads the reference ConvLSTM (dropout-free, so fully deterministic), maps
identical weights into our model, runs ONE supervised training step on the
same batch in both frameworks — BCE loss (lib/train_stcnn.py:90,107),
Adam(lr, (0.5, 0.999)) (lib/train_stcnn.py:91) — and compares the loss,
the updated parameters and the updated BatchNorm running statistics.
This pins the loss, autodiff and optimiser semantics end-to-end, not just
forward activations.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_torch_parity import _np_sd  # noqa: E402
# (the ref_modules fixture lives in tests/conftest.py)

from vfd_gan_tpu.models.convlstm import ConvLSTMModel  # noqa: E402
from vfd_gan_tpu.ops.losses import bce  # noqa: E402
from vfd_gan_tpu.train.state import NetState, make_adam  # noqa: E402
from vfd_gan_tpu.utils.torch_compat import convlstm_from_torch  # noqa: E402

LR = 1e-3


def test_one_supervised_step_matches_torch(ref_modules):  # noqa: F811
    import types

    ref_mod = ref_modules.convlstm
    ref_mod.ConvLSTMCell.init_hidden = lambda self, b: (
        torch.zeros(b, self.hidden_dim, self.height, self.width),
        torch.zeros(b, self.hidden_dim, self.height, self.width))

    torch.manual_seed(7)
    args = types.SimpleNamespace(isize=12)
    ref = ref_mod.ConvLSTMModel(args).train()

    rng = np.random.default_rng(8)
    x = rng.uniform(-1, 1, (2, 3, 4, 12, 12)).astype(np.float32)
    gt = (rng.uniform(size=(2, 1, 4, 12, 12)) > 0.8).astype(np.float32)

    # ---- torch step ----
    opt = torch.optim.Adam(ref.parameters(), lr=LR, betas=(0.5, 0.999))
    opt.zero_grad()
    pred = ref(torch.from_numpy(x))
    loss_t = torch.nn.BCELoss()(pred, torch.from_numpy(gt))
    loss_t.backward()
    opt.step()
    sd_after = _np_sd(ref)

    # ---- our step (same starting weights: re-derive from the pre-step
    # state dict captured before the update) ----
    torch.manual_seed(7)
    ref0 = ref_mod.ConvLSTMModel(args)
    variables = jax.tree_util.tree_map(jnp.asarray,
                                       convlstm_from_torch(_np_sd(ref0)))
    model = ConvLSTMModel()
    tx = make_adam(LR, 0.5)
    state = NetState.create(variables, tx)

    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    gtj = jnp.asarray(gt.transpose(0, 2, 3, 4, 1))

    def loss_fn(params):
        p, mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            xj, True, mutable=["batch_stats"])
        return bce(p, gtj), mut["batch_stats"]

    (loss_j, new_stats), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_grads(tx, grads, new_stats)

    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)

    # updated params: compare through the converter applied to the updated
    # torch state dict
    want = convlstm_from_torch(sd_after)
    got_params = jax.device_get(state.params)
    for i in (1, 2, 3):
        # atol 2e-5 (not 1e-5): the hoisted input->gates conv reassociates
        # the gate tap-sum (conv(concat) -> conv(x)+conv(h), convlstm.py
        # ConvLSTMLayer) and Adam's grad normalisation amplifies the ~1e-7
        # forward noise on near-zero-moment elements; observed max 1.3e-5
        # on 1/12096 elements (PARITY.md "ConvLSTM gate-conv split").
        np.testing.assert_allclose(
            got_params[f"clstm{i}"]["gate_kernel"],
            want["params"][f"clstm{i}"]["gate_kernel"], atol=2e-5)
        np.testing.assert_allclose(
            got_params[f"bn{i}"]["BatchNorm_0"]["scale"],
            want["params"][f"bn{i}"]["BatchNorm_0"]["scale"], atol=1e-5)
    np.testing.assert_allclose(got_params["head_kernel"],
                               want["params"]["head_kernel"], atol=1e-5)

    # BN running stats after one train-mode forward
    got_stats = jax.device_get(state.batch_stats)
    for i in (1, 2, 3):
        np.testing.assert_allclose(
            got_stats[f"bn{i}"]["BatchNorm_0"]["mean"],
            want["batch_stats"][f"bn{i}"]["BatchNorm_0"]["mean"], atol=1e-5)
        np.testing.assert_allclose(
            got_stats[f"bn{i}"]["BatchNorm_0"]["var"],
            want["batch_stats"][f"bn{i}"]["BatchNorm_0"]["var"], atol=1e-5)
