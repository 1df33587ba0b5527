"""Loss ops vs independent numpy/torch oracles (SURVEY.md §4 unit-test list)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vfd_gan_tpu.ops import bce, bce_smooth, l2_loss, weighted_bce

rng = np.random.default_rng(0)


def test_l2_loss_matches_numpy():
    a = rng.normal(size=(2, 3, 4)).astype(np.float32)
    b = rng.normal(size=(2, 3, 4)).astype(np.float32)
    got = float(l2_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np.mean((a - b) ** 2), rtol=1e-6)
    elem = l2_loss(jnp.asarray(a), jnp.asarray(b), size_average=False)
    np.testing.assert_allclose(np.asarray(elem), (a - b) ** 2, rtol=1e-6)


@pytest.mark.parametrize("pos_weight", [2.0, 5.0, None])
def test_weighted_bce_matches_reference_formula(pos_weight):
    # reference formula (lib/utils.py:65-71): clamp, pos_weight on the
    # *negative* term, negated mean.
    p = rng.uniform(0, 1, size=(4, 8)).astype(np.float32)
    t = (rng.uniform(size=(4, 8)) > 0.5).astype(np.float32)
    pc = np.clip(p, 1e-8, 1 - 1e-8)
    w = 1.0 if pos_weight is None else pos_weight
    want = -np.mean(t * np.log(pc) + w * (1 - t) * np.log(1 - pc))
    got = float(weighted_bce(jnp.asarray(p), jnp.asarray(t), pos_weight=pos_weight))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_matches_torch():
    torch = pytest.importorskip("torch")
    p = rng.uniform(1e-4, 1 - 1e-4, size=(3, 7)).astype(np.float32)
    t = rng.uniform(0, 1, size=(3, 7)).astype(np.float32)
    want = torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)).item()
    got = float(bce(jnp.asarray(p), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_smooth_shifts_target():
    p = rng.uniform(0.1, 0.9, size=(5,)).astype(np.float32)
    t = np.ones(5, np.float32)
    plain = float(bce_smooth(jnp.asarray(p), jnp.asarray(t)))
    smoothed = float(bce_smooth(jnp.asarray(p), jnp.asarray(t), smooth_eps=0.2))
    want = float(bce(jnp.asarray(p), jnp.asarray((t + 0.2) / 2)))
    np.testing.assert_allclose(smoothed, want, rtol=1e-6)
    assert plain != smoothed
