"""--flow_scale is score-invariant for MyGAN: G's update path contains
no flow term.

The reference detaches every flow/discriminator input from G
(models/mygannet.py:279-312, PARITY.md "adv term is telemetry"), so the
flow resolution can only change D's training trajectory and the loss
telemetry — never G's parameters, and therefore never the scored
morphology-opened masks (which are functions of G alone,
models/mygannet.py:395-399).  This pins the argument that made
flow_scale=0.5 the production default (+4.8% step throughput,
BENCH_NOTES.md round 6): one fused train step at scale 1.0 vs 0.5 from
identical init must leave G's parameters IDENTICAL while D's diverge.
"""

from __future__ import annotations

import jax
import numpy as np

from vfd_gan_tpu.cli.trainer import build_iterators
from vfd_gan_tpu.config import Config
from vfd_gan_tpu.data.synthetic import make_dataset
from vfd_gan_tpu.parallel.mesh import shard_batch


def test_g_update_bit_invariant_to_flow_scale(tmp_path, tmp_path_factory):
    from vfd_gan_tpu.train.gan_engine import MyGanEngine

    root = str(tmp_path_factory.mktemp("fs_vids"))
    train_list, test_list = make_dataset(root, n_train=1, n_test=1,
                                         frames=48, size=72,
                                         include_originals=False)

    results = {}
    for scale in (1.0, 0.5):
        cfg = Config(model="mygan", isize=64, nfr=16, batchsize=1, ep=1,
                     freq=10 ** 6, ngf=4, ndf=4, lr=1e-4,
                     flow_scale=scale, result_root=str(tmp_path),
                     tensorboard=False, compute_dtype="float32", seed=7,
                     tr_plist=train_list, ts_plist=test_list).validate()
        eng = MyGanEngine(cfg, *build_iterators(cfg))
        batch = next(iter(eng.train_iter))
        g_state, d_state, metrics, _ = eng._train_step(
            eng.g_state, eng.d_state, shard_batch(eng.mesh, batch),
            jax.random.key(3))
        results[scale] = (
            [np.asarray(x) for x in
             jax.tree_util.tree_leaves(jax.device_get(g_state.params))],
            [np.asarray(x) for x in
             jax.tree_util.tree_leaves(jax.device_get(d_state.params))],
            {k: float(v) for k, v in metrics.items()})
        eng.close()

    # G: bit-identical (its loss/grad graph precedes the flow entirely)
    for a, b in zip(results[1.0][0], results[0.5][0]):
        np.testing.assert_array_equal(a, b)
    # D: genuinely different (the knob does change D's inputs)
    d_diff = max(float(np.max(np.abs(a - b)))
                 for a, b in zip(results[1.0][1], results[0.5][1]))
    assert d_diff > 0.0
    # telemetry moves with the flow; the G content loss does not
    assert results[1.0][2]["g/err_g_con/train"] == \
        results[0.5][2]["g/err_g_con/train"]
    assert results[1.0][2]["d/err_d/train"] != \
        results[0.5][2]["d/err_d/train"]
