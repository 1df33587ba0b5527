"""Multi-host env parsing + single-host passthrough of the DCN wiring."""

import numpy as np
import pytest

from vfd_gan_tpu.parallel.mesh import make_mesh
from vfd_gan_tpu.utils.runtime import (
    distributed_spec_from_env,
    host_local_batch_to_global,
)


def test_spec_absent_means_single_host():
    assert distributed_spec_from_env({}) is None


def test_spec_parses_triple():
    s = distributed_spec_from_env({
        "VFD_COORDINATOR": "10.0.0.2:8476",
        "VFD_NUM_PROCESSES": "4",
        "VFD_PROCESS_ID": "2",
    })
    assert s.coordinator == "10.0.0.2:8476"
    assert s.num_processes == 4 and s.process_id == 2


def test_spec_validation():
    with pytest.raises(ValueError):
        distributed_spec_from_env({"VFD_COORDINATOR": "no-port"})
    with pytest.raises(ValueError):
        distributed_spec_from_env({
            "VFD_COORDINATOR": "h:1", "VFD_NUM_PROCESSES": "2",
            "VFD_PROCESS_ID": "2"})


def test_single_host_passthrough_matches_shard_batch():
    mesh = make_mesh(2)
    batch = {"data": np.arange(2 * 4 * 6, dtype=np.float32)
             .reshape(2, 4, 6),
             "label": np.ones((2,), np.float32)}
    out = host_local_batch_to_global(mesh, batch)
    assert out["data"].shape == (2, 4, 6)
    np.testing.assert_array_equal(np.asarray(out["data"]), batch["data"])
    assert len(out["data"].sharding.device_set) == 2
