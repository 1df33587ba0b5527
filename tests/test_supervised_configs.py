"""Engine end-to-end smoke for the remaining supervised configs
(BASELINE.json config matrix: c2plus1d and xception; clstm is covered in
test_supervised_engine.py)."""

import numpy as np
import pytest

from vfd_gan_tpu.config import Config
from vfd_gan_tpu.cli.trainer import build_iterators
from vfd_gan_tpu.data.synthetic import make_dataset
from vfd_gan_tpu.train.supervised_engine import SupervisedEngine


@pytest.mark.parametrize("model,isize,nfr", [
    ("c2plus1d", 16, 16),   # needs four temporal halvings
    ("xception", 32, 8),    # needs /16 spatial from the strided trunk
])
def test_supervised_config_end_to_end(tmp_path, model, isize, nfr):
    # size == isize so the test split's Canny GT is not resized (fractional
    # edges truncate to all-zero labels under the reference's int32 cast —
    # a single-class sweep that correctly scores NaN and saves nothing).
    root = str(tmp_path / "cfg_vids")
    train_list, test_list = make_dataset(root, n_train=1, n_test=1,
                                         frames=32, size=isize)
    cfg = Config(model=model, isize=isize, nfr=nfr, batchsize=1, ep=1,
                 freq=10 ** 6, lr=1e-3, result_root=str(tmp_path),
                 tensorboard=False, compute_dtype="float32",
                 tr_plist=train_list, ts_plist=test_list).validate()
    eng = SupervisedEngine(cfg, *build_iterators(cfg))
    import jax
    from vfd_gan_tpu.parallel.mesh import shard_batch
    batch = next(iter(eng.train_iter))
    before = np.asarray(jax.tree_util.tree_leaves(eng.state.params)[0]).copy()
    metrics, _ = eng._do_train_step(shard_batch(eng.mesh, batch),
                                    jax.random.key(0))
    loss = float(metrics["loss/err/train"])
    assert np.isfinite(loss) and loss > 0
    after = np.asarray(jax.tree_util.tree_leaves(eng.state.params)[0])
    assert not np.allclose(before, after)
    roc, pr, f1 = eng.test()
    assert 0.0 <= pr <= 1.0
    eng.close()
