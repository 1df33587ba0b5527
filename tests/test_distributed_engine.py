"""A REAL 2-process multi-host training step == the single-process step.

Beyond the cluster smoke (test_distributed_spec.py), this drives the
actual engine code path across two jax.distributed CPU processes: both
children build the SAME SupervisedEngine over the 4 global devices
(2 local each), feed their half of one deterministic global batch
through ``host_local_batch_to_global`` (the per-host DCN assembly,
utils/runtime.py), run one fused train step collectively, and must
reproduce the single-process dp4 step's loss and updated parameters —
the multi-controller SPMD contract (SURVEY.md §2.3 / VERDICT r2
Missing #3).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from vfd_gan_tpu.config import Config
from vfd_gan_tpu.ops.augment import staging_size
from vfd_gan_tpu.parallel.mesh import shard_batch

B, NFR, ISIZE = 4, 8, 16


def _cfg(tmp):
    return Config(model="clstm", isize=ISIZE, nfr=NFR, batchsize=B, ep=1,
                  freq=10 ** 6, dp=4, lr=1e-4, result_root=str(tmp),
                  tensorboard=False, compute_dtype="float32", seed=7,
                  tr_plist="", ts_plist="").validate()


def _global_batch():
    rng = np.random.default_rng(0)
    s = staging_size(ISIZE)
    return {
        "data": rng.integers(0, 255, (B, NFR, s, s, 3), dtype=np.uint8),
        "real": rng.integers(0, 255, (B, NFR, s, s, 3), dtype=np.uint8),
        "mask": rng.integers(0, 2, (B, NFR, s, s, 1),
                             dtype=np.uint8) * np.uint8(255),
        "label": np.ones((B, NFR), np.float32),
    }


_CHILD = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    sys.path.insert(0, os.environ["VFD_TEST_DIR"])
    from test_distributed_engine import _cfg, _global_batch
    from vfd_gan_tpu.utils.runtime import (host_local_batch_to_global,
                                           init_distributed)
    from vfd_gan_tpu.train.supervised_engine import SupervisedEngine

    assert init_distributed()
    assert jax.process_count() == 2 and jax.device_count() == 4

    eng = SupervisedEngine(_cfg(os.environ["VFD_TEST_TMP"]),
                           train_iter=None, test_iter=None)
    assert dict(eng.mesh.shape) == {"dp": 4}

    pid = jax.process_index()
    gb = _global_batch()
    local = {k: v[2 * pid:2 * pid + 2] for k, v in gb.items()}
    sharded = host_local_batch_to_global(eng.mesh, local)
    state, loss, _ = eng._train_step(eng.state, sharded,
                                     jax.random.key(3), True)
    leaves = [np.asarray(x) for x in
              jax.tree_util.tree_leaves(jax.device_get(state.params))]
    checksum = float(sum(np.abs(a).sum() for a in leaves))
    print(f"proc {pid}: RESULT loss={float(loss):.9f} "
          f"checksum={checksum:.6f}")
    eng.close()
""")


def test_two_process_engine_step_matches_single(tmp_path):
    from vfd_gan_tpu.train.supervised_engine import SupervisedEngine

    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")

    # single-process dp4 oracle on the same deterministic global batch
    eng = SupervisedEngine(_cfg(tmp_path), train_iter=None, test_iter=None)
    state, loss, _ = eng._train_step(
        eng.state, shard_batch(eng.mesh, _global_batch()),
        jax.random.key(3), True)
    oracle_loss = float(loss)
    oracle_leaves = [np.asarray(x) for x in
                     jax.tree_util.tree_leaves(jax.device_get(state.params))]
    oracle_checksum = float(sum(np.abs(a).sum() for a in oracle_leaves))
    eng.close()

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
            "VFD_NO_COMP_CACHE": "1",
            "VFD_TEST_DIR": os.path.dirname(os.path.abspath(__file__)),
            "VFD_TEST_TMP": str(tmp_path / f"proc{pid}"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    try:
        for p in procs:
            # generous: engine init + train-step compile on a 1-core host
            # that may be running the rest of the suite concurrently
            out, _ = p.communicate(timeout=1800)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if "RESULT" in line:
                pid = int(line.split("proc ")[1].split(":")[0])
                loss = float(line.split("loss=")[1].split()[0])
                ck = float(line.split("checksum=")[1])
                results[pid] = (loss, ck)
    assert set(results) == {0, 1}, outs

    # both controllers agree with each other AND with the single-process
    # oracle (same global batch, same seed, same GSPMD math — tolerance
    # covers device-topology reduction-order noise only)
    for pid in (0, 1):
        np.testing.assert_allclose(results[pid][0], oracle_loss, rtol=1e-5)
        np.testing.assert_allclose(results[pid][1], oracle_checksum,
                                   rtol=1e-5)
    assert results[0] == results[1]
