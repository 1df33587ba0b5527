"""CLI surface tests: trainer dispatch, comparison eval, frame dump."""

import os

import numpy as np
import pytest

from vfd_gan_tpu.cli.evaluate_models import main as eval_main
from vfd_gan_tpu.cli.frames import main as frames_main
from vfd_gan_tpu.cli.trainer import build_engine, build_iterators
from vfd_gan_tpu.config import Config, parse_args
from vfd_gan_tpu.data.synthetic import make_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_vids"))
    return root, *make_dataset(root, n_train=1, n_test=1, frames=16, size=40)


def test_parse_args_reference_flags():
    cfg = parse_args(["--model", "clstm", "--isize", "64", "--nfr", "8",
                      "--batchsize", "2", "--lr", "0.001", "--ep", "3",
                      "--gpu", "0,1", "--tr_plist", "a.txt",
                      "--ts_plist", "b.txt"])
    assert cfg.model == "clstm" and cfg.isize == 64 and cfg.nfr == 8
    assert cfg.lr == 0.001 and cfg.ep == 3
    # defaults mirror lib/args.py
    d = Config()
    assert (d.isize, d.nfr, d.batchsize, d.lr, d.beta1) == (128, 16, 4, 2e-5, 0.5)
    assert (d.w_adv, d.w_con, d.pos_weight, d.freq) == (1.0, 10.0, 2.0, 50)


def test_trainer_builds_each_engine(dataset, tmp_path):
    root, train_list, test_list = dataset
    cfg = Config(model="clstm", isize=16, nfr=8, batchsize=1, ep=1,
                 result_root=str(tmp_path), tensorboard=False,
                 compute_dtype="float32",
                 tr_plist=train_list, ts_plist=test_list).validate()
    train_iter, test_iter = build_iterators(cfg)
    eng = build_engine(cfg, train_iter, test_iter)
    assert eng is not None
    eng.close()


def test_evaluate_models_cli(dataset, tmp_path):
    root, train_list, test_list = dataset
    # train one tiny clstm for a couple of steps to produce a checkpoint
    from vfd_gan_tpu.train.supervised_engine import SupervisedEngine
    cfg = Config(model="clstm", isize=16, nfr=8, batchsize=1, ep=1, freq=10**6,
                 result_root=str(tmp_path), tensorboard=False,
                 compute_dtype="float32",
                 tr_plist=train_list, ts_plist=test_list).validate()
    train_iter, test_iter = build_iterators(cfg)
    eng = SupervisedEngine(cfg, train_iter, test_iter)
    eng._save_weights("roc")
    ckpt = os.path.join(eng.dirs.weights, os.listdir(eng.dirs.weights)[0])
    eng.close()

    model_list = tmp_path / "models.txt"
    model_list.write_text(ckpt + "\n")
    out_dir = tmp_path / "cmp"
    results = eval_main(["--test_data_path", test_list,
                         "--test_model_list_path", str(model_list),
                         "--isize", "16", "--nfr", "8", "--batchsize", "1",
                         "--result_path", str(out_dir)])
    assert "ConvLSTM" in results
    assert (out_dir / "roc_curve.png").exists()


def test_evaluate_models_cli_gan_checkpoint(dataset, tmp_path):
    """The 'Propose model[GAN]' path: a paired netG/netD checkpoint loads
    through the structure dispatch and evaluates the generator."""
    import jax
    import jax.numpy as jnp
    from vfd_gan_tpu.models.mygan import Generator
    from vfd_gan_tpu.train.checkpoints import save_checkpoint

    root, _, test_list = dataset
    # the U-Net needs four temporal halvings -> nfr 16 (= one window of the
    # 16-frame fixture videos)
    x = jnp.zeros((1, 16, 16, 16, 3), jnp.float32)
    variables = jax.jit(
        lambda k: Generator(ngf=32).init({"params": k, "dropout": k}, x,
                                         False))(jax.random.key(0))
    ckpt = tmp_path / "mygan_roc_ep0001"
    save_checkpoint(str(ckpt), {
        "netG": {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
        "step": 1})

    model_list = tmp_path / "gan_models.txt"
    model_list.write_text(str(ckpt) + "\n")
    out_dir = tmp_path / "gan_cmp"
    results = eval_main(["--test_data_path", test_list,
                         "--test_model_list_path", str(model_list),
                         "--isize", "16", "--nfr", "16", "--batchsize", "1",
                         "--metric", "pr",
                         "--result_path", str(out_dir)])
    assert "Propose model[GAN]" in results
    assert (out_dir / "pr_curve.png").exists()


def test_evaluate_models_cli_mixed_pth_and_orbax(dataset, tmp_path,
                                                 ref_modules):
    """A model list mixing a reference ``.pth`` (substring dispatch,
    test.py:115-144,163) with an Orbax checkpoint sweeps into ONE overlaid
    figure — a reference user's checkpoints work unmodified."""
    import torch
    import jax
    import jax.numpy as jnp
    from vfd_gan_tpu.models.convlstm import ConvLSTMModel
    from vfd_gan_tpu.train.checkpoints import save_checkpoint

    root, _, test_list = dataset

    # (a) a genuine reference-layout .pth: the reference AutoEncoder's
    # state_dict saved the way lib/train_stcnn.py:136-140 does
    torch.manual_seed(0)
    ref_ae = ref_modules.stcnn.AutoEncoder()
    pth = tmp_path / "c2plus1d_roc-0000_step0000.pth"
    torch.save({"epoch": 0, "state_dict": ref_ae.state_dict()}, str(pth))

    # (b) one of our Orbax checkpoints (ConvLSTM)
    x = jnp.zeros((1, 16, 16, 16, 3), jnp.float32)
    variables = jax.jit(ConvLSTMModel().init,
                        static_argnums=2)(jax.random.key(0), x, False)
    ckpt = tmp_path / "clstm_roc_ep0001"
    save_checkpoint(str(ckpt), {
        "state": {"params": variables["params"],
                  "batch_stats": variables["batch_stats"]},
        "step": 1})

    model_list = tmp_path / "mixed_models.txt"
    model_list.write_text(f"{pth}\n{ckpt}\n")
    out_dir = tmp_path / "mixed_cmp"
    results = eval_main(["--test_data_path", test_list,
                         "--test_model_list_path", str(model_list),
                         "--isize", "16", "--nfr", "16", "--batchsize", "1",
                         "--result_path", str(out_dir)])
    assert "(2+1)DCNN" in results and "ConvLSTM" in results
    assert (out_dir / "roc_curve.png").exists()


def test_frames_dump(dataset, tmp_path):
    root, _, _ = dataset
    out = tmp_path / "png"
    frames_main(["--src", root, "--dst", str(out)])
    pngs = [p for p, _, files in os.walk(out) for f in files
            if f.endswith(".png")]
    assert pngs
    # mask dirs exist and contain inverted frames
    mask_dirs = [os.path.join(p, d) for p, dirs, _ in os.walk(out)
                 for d in dirs if d == "mask"]
    assert mask_dirs


def test_model_from_params_infers_generator_width():
    # non-default --ngf checkpoints must reconstruct at their own width
    import numpy as np

    from vfd_gan_tpu.cli.evaluate_models import _model_from_params

    params = {"dconv1": {"stconv": {"temporal_kernel": np.zeros((3, 8, 4))}},
              "uconv1": {}}
    model, name = _model_from_params(params)
    assert model.ngf == 4 and name == "Propose model[GAN]"
