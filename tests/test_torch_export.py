"""Reverse interop: our checkpoints -> reference-format ``.pth``.

Round-trips real reference state_dicts through
``torch_compat.*_from_torch`` -> ``torch_export.*_to_torch`` and demands
exact equality on every key, for every model family — proving the export
is the lossless inverse of the import.  Also proves an exported file loads
into the actual reference module with ``strict=True`` (the contract the
reference's own ``test.py:115-144`` checkpoint loader relies on) and that
the export CLI writes reference-shaped ``{'epoch', 'state_dict'}`` files.
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _np_sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _roundtrip(sd, importer, exporter):
    got = exporter(importer(sd))
    assert set(got) == set(sd), (
        f"key sets differ: missing={sorted(set(sd) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(sd))[:5]}")
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue  # importer drops it; exporter re-emits 0 (fresh modules)
        np.testing.assert_array_equal(got[k], sd[k], err_msg=k)
        assert got[k].dtype == sd[k].dtype, k


def test_mygan_generator_roundtrip(ref_modules):
    from vfd_gan_tpu.utils.torch_compat import mygan_generator_from_torch
    from vfd_gan_tpu.utils.torch_export import mygan_generator_to_torch
    torch.manual_seed(0)
    _roundtrip(_np_sd(ref_modules.mygan.NetG()),
               mygan_generator_from_torch, mygan_generator_to_torch)


def test_mygan_dualdisc_roundtrip(ref_modules):
    from vfd_gan_tpu.utils.torch_compat import mygan_dualdisc_from_torch
    from vfd_gan_tpu.utils.torch_export import mygan_dualdisc_to_torch
    torch.manual_seed(1)
    args = types.SimpleNamespace(nfr=16, isize=128)
    _roundtrip(_np_sd(ref_modules.mygan.NetD(args)),
               mygan_dualdisc_from_torch, mygan_dualdisc_to_torch)


def test_autoencoder_roundtrip(ref_modules):
    from vfd_gan_tpu.utils.torch_compat import stcnn_autoencoder_from_torch
    from vfd_gan_tpu.utils.torch_export import stcnn_autoencoder_to_torch
    torch.manual_seed(2)
    _roundtrip(_np_sd(ref_modules.stcnn.AutoEncoder()),
               stcnn_autoencoder_from_torch, stcnn_autoencoder_to_torch)


def test_convlstm_roundtrip(ref_modules):
    from vfd_gan_tpu.utils.torch_compat import convlstm_from_torch
    from vfd_gan_tpu.utils.torch_export import convlstm_to_torch
    torch.manual_seed(3)
    args = types.SimpleNamespace(nfr=16, isize=128, ich=3, batchsize=1)
    _roundtrip(_np_sd(ref_modules.convlstm.ConvLSTMModel(args)),
               convlstm_from_torch, convlstm_to_torch)


def test_xception_roundtrip(ref_modules):
    from vfd_gan_tpu.utils.torch_compat import xception_from_torch
    from vfd_gan_tpu.utils.torch_export import xception_to_torch
    torch.manual_seed(4)
    _roundtrip(_np_sd(ref_modules.xception.Xception()),
               xception_from_torch, xception_to_torch)


def test_anogan_roundtrips(ref_modules):
    from vfd_gan_tpu.utils.torch_compat import (
        anogan_discriminator_from_torch, anogan_generator_from_torch)
    from vfd_gan_tpu.utils.torch_export import (
        anogan_discriminator_to_torch, anogan_generator_to_torch)
    torch.manual_seed(5)
    _roundtrip(_np_sd(ref_modules.anogan.NetG()),
               anogan_generator_from_torch, anogan_generator_to_torch)
    _roundtrip(_np_sd(ref_modules.anogan.NetD()),
               anogan_discriminator_from_torch, anogan_discriminator_to_torch)


def test_export_loads_into_reference_module_strict(ref_modules, tmp_path):
    """A freshly-initialised OUR generator exports to a .pth the reference
    NetG ingests with strict=True, and the torch forward then matches ours."""
    import jax
    import jax.numpy as jnp

    from vfd_gan_tpu.models.mygan import Generator
    from vfd_gan_tpu.utils.torch_export import save_pth

    ours = Generator(ngf=32)
    variables = jax.jit(ours.init, static_argnums=2)(
        jax.random.key(0), jnp.zeros((1, 16, 32, 32, 3)), False)
    variables = jax.device_get(variables)

    out = tmp_path / "roc_ep0001_netG.pth"
    save_pth(str(out), variables, "mygan_generator", epoch=1)

    blob = torch.load(str(out), map_location="cpu", weights_only=True)
    assert blob["epoch"] == 1
    ref = ref_modules.mygan.NetG()
    ref.load_state_dict(blob["state_dict"], strict=True)
    ref.eval()

    x = np.random.default_rng(7).uniform(
        -1, 1, size=(1, 3, 16, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = ours.apply(jax.tree_util.tree_map(jnp.asarray, variables),
                     jnp.asarray(x.transpose(0, 2, 3, 4, 1)), False)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), want, atol=2e-4)


def test_export_cli_gan_pair(tmp_path):
    """CLI: an Orbax GAN checkpoint exports to a reference-named
    netG/netD .pth pair."""
    import jax
    import jax.numpy as jnp

    from vfd_gan_tpu.cli.export_torch import main
    from vfd_gan_tpu.models.mygan import DualDisc, Generator
    from vfd_gan_tpu.train.checkpoints import save_checkpoint

    g = jax.jit(Generator(ngf=8).init, static_argnums=2)(
        jax.random.key(0), jnp.zeros((1, 16, 32, 32, 3)), False)
    d = jax.jit(DualDisc(ndf=8).init, static_argnums=3)(
        jax.random.key(1), jnp.zeros((1, 16, 128, 128, 3)),
        jnp.zeros((1, 16, 128, 128, 3)), False)
    tree = {
        "netG": {"params": g["params"], "batch_stats": g["batch_stats"],
                 "opt_state": {}},
        "netD": {"params": d["params"], "batch_stats": d["batch_stats"],
                 "opt_state": {}},
        "step": 40,
        "loop": {"epoch": 3},
    }
    ckpt = tmp_path / "roc_ep0003"
    save_checkpoint(str(ckpt), jax.device_get(tree))

    main(["--ckpt", str(ckpt), "--out", str(tmp_path / "exported")])

    for net, kind in (("netG", {"dconv1"}), ("netD", {"spatdisc"})):
        path = tmp_path / "exported" / f"roc_ep0003_{net}.pth"
        assert path.exists(), path
        blob = torch.load(str(path), map_location="cpu", weights_only=True)
        assert blob["epoch"] == 3
        assert kind & {k.split(".")[0] for k in blob["state_dict"]}


def test_export_cli_supervised(tmp_path):
    """CLI: a supervised checkpoint exports to a single .pth."""
    import jax
    import jax.numpy as jnp

    from vfd_gan_tpu.cli.export_torch import main
    from vfd_gan_tpu.models.convlstm import ConvLSTMModel
    from vfd_gan_tpu.train.checkpoints import save_checkpoint

    v = jax.jit(ConvLSTMModel().init, static_argnums=2)(
        jax.random.key(0), jnp.zeros((1, 4, 16, 16, 3)), False)
    tree = {"state": {"params": v["params"], "batch_stats": v["batch_stats"],
                      "opt_state": {}},
            "step": 7, "loop": {"epoch": 1}}
    ckpt = tmp_path / "roc-0.9000_step0007"
    save_checkpoint(str(ckpt), jax.device_get(tree))

    main(["--ckpt", str(ckpt), "--out", str(tmp_path / "out")])
    path = tmp_path / "out" / "roc-0.9000_step0007.pth"
    blob = torch.load(str(path), map_location="cpu", weights_only=True)
    assert "clstm1.cell_list.0.conv.weight" in blob["state_dict"]
