"""Runtime knobs: persistent compilation cache + multi-host initialisation.

Remote/tunnelled TPU attachments (and large fused steps generally) have
multi-minute XLA compile times; the persistent cache makes second runs
near-instant.  Called by bench.py, __graft_entry__ and the CLIs.
Disable with VFD_NO_COMP_CACHE=1.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


def enable_compilation_cache(path: str | None = None) -> None:
    if os.environ.get("VFD_NO_COMP_CACHE") == "1":
        return
    import jax
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cache_dir = path or os.environ.get(
        "VFD_COMP_CACHE_DIR", os.path.join(repo_root, ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# --------------------------------------------------------------------------
# Multi-host (DCN) initialisation
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class DistributedSpec:
    """Multi-host topology parsed from the environment.

    The scheduler (GKE/SLURM/manual) exports:
      VFD_COORDINATOR  host:port of process 0   (e.g. "10.0.0.2:8476")
      VFD_NUM_PROCESSES  total host count
      VFD_PROCESS_ID     this host's rank in [0, num_processes)
    All three must be present for multi-host mode; otherwise single-host.
    """

    coordinator: str
    num_processes: int
    process_id: int

    def validate(self) -> "DistributedSpec":
        if ":" not in self.coordinator:
            raise ValueError(
                f"VFD_COORDINATOR must be host:port, got {self.coordinator!r}")
        if not 0 <= self.process_id < self.num_processes:
            raise ValueError(
                f"VFD_PROCESS_ID {self.process_id} outside "
                f"[0, {self.num_processes})")
        return self


def distributed_spec_from_env(env=None) -> DistributedSpec | None:
    """None (single-host) unless the full coordinator triple is exported."""
    env = os.environ if env is None else env
    coord = env.get("VFD_COORDINATOR")
    if not coord:
        return None
    return DistributedSpec(
        coordinator=coord,
        num_processes=int(env.get("VFD_NUM_PROCESSES", "1")),
        process_id=int(env.get("VFD_PROCESS_ID", "0")),
    ).validate()


def init_distributed() -> bool:
    """Join the multi-host job described by the environment (no-op and
    False on a single host).  Must run before any other jax call; after
    it, ``jax.devices()`` is the global device list and the GSPMD engines
    (mesh construction, shard_batch, jit) work unchanged — per-host data
    feeding goes through ``host_local_batch_to_global``.
    """
    spec = distributed_spec_from_env()
    if spec is None:
        return False
    import jax
    jax.distributed.initialize(
        coordinator_address=spec.coordinator,
        num_processes=spec.num_processes,
        process_id=spec.process_id,
    )
    return True


def host_local_batch_to_global(mesh, batch):
    """Assemble per-host batch shards into global sharded arrays.

    Each host's iterator yields its LOCAL slice of the global batch
    (global_batchsize / num_hosts clips); this stitches them into global
    jax.Arrays laid out like ``parallel.mesh.shard_batch`` expects.
    Single-host meshes pass through shard_batch unchanged.
    """
    import jax
    from vfd_gan_tpu.parallel.mesh import batch_sharding, shard_batch

    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    from jax.sharding import NamedSharding, PartitionSpec as P
    full = batch_sharding(mesh)
    dp_only = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            full if x.ndim >= 2 else dp_only, x), batch)
