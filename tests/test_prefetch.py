"""Device prefetch: order-preserving, complete, sharded."""

import numpy as np

from vfd_gan_tpu.parallel.mesh import make_mesh
from vfd_gan_tpu.parallel.prefetch import device_prefetch


def test_prefetch_preserves_order_and_count():
    mesh = make_mesh(2)
    batches = [{"x": np.full((4, 3), i, np.float32)} for i in range(7)]
    out = list(device_prefetch(batches, mesh, depth=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]),
                                      batches[i]["x"])
        assert b["x"].sharding.is_fully_replicated is False


def test_prefetch_short_iterator():
    mesh = make_mesh(1)
    batches = [{"x": np.ones((2, 2), np.float32)}]
    out = list(device_prefetch(batches, mesh, depth=4))
    assert len(out) == 1
