"""--moe_experts: the Xception-3D MoE variant (the ep-axis consumer).

The reference has no MoE (SURVEY.md §2.3); this is the documented
extension wiring parallel/moe.py into a real model family
(models/moe_block.py, VERDICT r2 Next #9): a residual token-MoE block
after the middle chain, expert params sharded over the mesh's ``ep``
axis via --moe_shards.  These tests pin the consumer contract: the
variant trains (aux loss included), the expert state really lives split
over ``ep``, and a dp2 x ep2 step matches the unsharded dp1 step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfd_gan_tpu.cli.trainer import build_iterators
from vfd_gan_tpu.config import Config
from vfd_gan_tpu.data.synthetic import make_dataset
from vfd_gan_tpu.models import build_mask_model
from vfd_gan_tpu.parallel.mesh import shard_batch


def test_validate_constraints():
    with pytest.raises(ValueError, match="xception"):
        Config(model="clstm", isize=16, nfr=8, moe_experts=2).validate()
    with pytest.raises(ValueError, match="moe_shards"):
        Config(model="xception", isize=32, nfr=8, moe_experts=3,
               moe_shards=2).validate()
    with pytest.raises(ValueError, match="pp"):
        Config(model="xception", isize=32, nfr=8, moe_experts=2,
               pp=2).validate()


def test_moe_variant_forward_and_aux():
    cfg = Config(model="xception", isize=32, nfr=8, batchsize=1,
                 xwidth=0.02, moe_experts=2).validate()
    model = build_mask_model("xception", cfg, jnp.float32)
    x = jnp.zeros((1, 8, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, x, False)
    moe_params = variables["params"]["moe"]
    assert set(moe_params) == {"router", "experts_w1", "experts_b1",
                               "experts_w2", "experts_b2"}
    assert moe_params["experts_w1"].shape[0] == 2

    (pred, mut) = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        x, True, mutable=["batch_stats", "moe_aux"],
        rngs={"dropout": jax.random.key(2)})
    assert pred.shape == (1, 8, 32, 32, 1)
    assert np.isfinite(np.asarray(pred)).all()
    aux = jax.tree_util.tree_leaves(mut["moe_aux"])
    assert aux and np.isfinite(float(sum(jnp.sum(a) for a in aux)))


def test_moe_dp2_ep2_matches_dp1(tmp_path, tmp_path_factory):
    """Expert-parallel training step == unsharded step on the same global
    batch, with the expert leaves genuinely split over ``ep``."""
    from vfd_gan_tpu.train.supervised_engine import SupervisedEngine

    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    root = str(tmp_path_factory.mktemp("moe_vids"))
    train_list, test_list = make_dataset(root, n_train=2, n_test=1,
                                         frames=16, size=32)

    results = {}
    for dp, epar in ((1, 1), (2, 2)):
        cfg = Config(model="xception", isize=32, nfr=8, batchsize=2,
                     xwidth=0.02, moe_experts=2, moe_shards=epar, ep=1,
                     freq=10 ** 6, dp=dp, lr=1e-4,
                     result_root=str(tmp_path), tensorboard=False,
                     compute_dtype="float32", seed=7,
                     tr_plist=train_list, ts_plist=test_list).validate()
        eng = SupervisedEngine(cfg, *build_iterators(cfg))
        if epar == 2:
            assert dict(eng.mesh.shape) == {"dp": 2, "ep": 2}
            for name in ("experts_w1", "experts_b1", "experts_w2",
                         "experts_b2"):
                leaf = eng.state.params["moe"][name]
                assert leaf.sharding.spec[0] == "ep", (name,
                                                       leaf.sharding.spec)
                assert leaf.sharding.shard_shape(leaf.shape)[0] == 1
            assert eng.state.params["moe"]["router"].sharding.spec == ()
        batch = next(iter(eng.train_iter))
        state, loss, _ = eng._train_step(
            eng.state, shard_batch(eng.mesh, batch), jax.random.key(3),
            True)
        results[(dp, epar)] = (
            float(loss),
            [np.asarray(x) for x in jax.tree_util.tree_leaves(
                jax.device_get((state.params, state.batch_stats)))])
        eng.close()

    # same reduction-noise envelope rationale as tests/test_dp_equivalence:
    # Adam's first step moves weights by <= ~lr, so reduction noise at
    # worst flips a near-zero gradient's sign (2*lr = 2e-4 envelope) while
    # a semantic dp/ep bug diverges by O(weight scale 0.02)
    np.testing.assert_allclose(results[(1, 1)][0], results[(2, 2)][0],
                               rtol=1e-5)
    for a, b in zip(results[(1, 1)][1], results[(2, 2)][1]):
        np.testing.assert_allclose(a, b, atol=4e-4)
