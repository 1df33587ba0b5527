"""Multi-host env parsing + single-host passthrough of the DCN wiring,
plus a REAL 2-process ``jax.distributed`` smoke (VERDICT r2 Next #7)."""

import os
import socket
import subprocess
import sys
import textwrap

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


_CHILD = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from vfd_gan_tpu.utils.runtime import (host_local_batch_to_global,
                                           init_distributed)
    from vfd_gan_tpu.parallel.mesh import make_mesh

    assert init_distributed(), "coordinator triple not picked up"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert jax.device_count() == 4, jax.device_count()

    # per-host local slice -> global sharded batch -> global reduction
    pid = jax.process_index()
    mesh = make_mesh(4)
    local = {
        "data": np.full((2, 3, 5), float(pid + 1), np.float32),
        "label": np.full((2,), float(pid + 1), np.float32),
    }
    out = host_local_batch_to_global(mesh, local)
    assert out["data"].shape == (4, 3, 5), out["data"].shape
    total = jax.jit(lambda b: b["data"].sum() + b["label"].sum())(out)
    # hosts 0/1 contribute 2*3*5*1 + 2*3*5*2 = 90 and labels 2*1+2*2 = 6
    np.testing.assert_allclose(float(total), 96.0)
    print(f"proc {pid}: OK total={float(total)}")
""")


def test_two_process_jax_distributed_cpu_smoke(tmp_path):
    """Two REAL processes form a jax.distributed CPU cluster through the
    VFD_* env wiring (utils/runtime.py): global device view, per-host
    batch assembly round trip, and a cross-host jitted reduction.

    Each child is re-exec'd with the sandbox recipe (config.update after
    import — see CLAUDE.md) plus 2 virtual CPU devices per process."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append("--xla_force_host_platform_device_count=2")
        env["XLA_FLAGS"] = " ".join(flags)
        env.update({
            "VFD_COORDINATOR": f"127.0.0.1:{port}",
            "VFD_NUM_PROCESSES": "2",
            "VFD_PROCESS_ID": str(pid),
            # children must not inherit the parent's persistent-cache lock
            "VFD_NO_COMP_CACHE": "1",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    try:
        for p in procs:
            # generous: cluster formation + a jit compile on a 1-core host
            # that may be running the rest of the suite concurrently
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out}"
    assert any("proc 0: OK" in o for o in outs)
    assert any("proc 1: OK" in o for o in outs)
