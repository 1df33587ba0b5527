"""Test configuration: force a deterministic 8-virtual-device CPU platform.

The reference framework supported single-host multi-GPU data parallelism via
``torch.nn.DataParallel`` (reference: models/mygannet.py:232-237).  Our tests
validate the TPU-native replacement (``jax.sharding`` + ``shard_map`` over a
Mesh) on a virtual 8-device CPU mesh so that they run anywhere, per the
distributed-test strategy in SURVEY.md §4.
"""

import os

# Force-override the platform: the sandbox pre-sets JAX_PLATFORMS=axon (a
# tunnelled remote TPU) and its sitecustomize imports jax at interpreter
# startup, so the env var alone is read too early to help — the post-import
# config.update below is what actually switches tests onto local CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()
