"""Inference CLI end-to-end: checkpoint -> mask/overlay videos + scores."""

import os


from vfd_gan_tpu.cli.infer import main as infer_main
from vfd_gan_tpu.config import Config
from vfd_gan_tpu.data.synthetic import make_dataset


def test_infer_writes_artifacts(tmp_path):
    root = str(tmp_path / "vids")
    train_list, test_list = make_dataset(root, n_train=1, n_test=1,
                                         frames=16, size=40)
    from vfd_gan_tpu.cli.trainer import build_iterators
    from vfd_gan_tpu.train.supervised_engine import SupervisedEngine
    cfg = Config(model="clstm", isize=16, nfr=8, batchsize=1, ep=1,
                 freq=10 ** 6, result_root=str(tmp_path), tensorboard=False,
                 compute_dtype="float32",
                 tr_plist=train_list, ts_plist=test_list).validate()
    eng = SupervisedEngine(cfg, *build_iterators(cfg))
    eng._save_weights("roc")
    ckpt = os.path.join(eng.dirs.weights, os.listdir(eng.dirs.weights)[0])
    eng.close()

    with open(test_list) as f:
        video = f.readline().strip()
    out = tmp_path / "infer_out"
    infer_main(["--video", video, "--ckpt", ckpt, "--out", str(out),
                "--isize", "16", "--nfr", "8"])
    assert (out / "mask.mp4").exists()
    assert (out / "overlay.mp4").exists()
    lines = (out / "scores.csv").read_text().strip().splitlines()
    assert len(lines) == 1 + 16  # header + per-frame rows
