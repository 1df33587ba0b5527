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


# ---------------------------------------------------------------------------
# Shared fixture: the actual reference modules (read-only, /root/reference),
# with stubs for the third-party packages this image lacks.  Used by the
# golden parity tests and the CLI .pth-ingestion tests.
# ---------------------------------------------------------------------------

import sys
import types

import pytest


@pytest.fixture(scope="session")
def ref_modules():
    import os
    torch = pytest.importorskip("torch")  # noqa: F841
    REF = "/root/reference"
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    # the reference's videotransforms imports skimage, which this image
    # lacks; stub just enough for import
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        skimage.transform = types.ModuleType("skimage.transform")
        skimage.transform.rotate = lambda img, angle: img
        skimage.transform.resize = lambda img, size, **k: img
        sys.modules["skimage"] = skimage
        sys.modules["skimage.transform"] = skimage.transform
    # this image also lacks torchvision; stub the names the reference touches
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.functional = types.ModuleType(
            "torchvision.transforms.functional")
        tv.utils = types.ModuleType("torchvision.utils")
        tv.utils.save_image = lambda *a, **k: None
        tv.utils.make_grid = lambda *a, **k: None
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.transforms.functional"] = tv.transforms.functional
        sys.modules["torchvision.utils"] = tv.utils
    sys.path.insert(0, REF)
    try:
        import models.mygannet as ref_mygan
        import models.mystcnn as ref_stcnn
        import models.convlstm as ref_convlstm
        import models.xception as ref_xception
        import models.anogan as ref_anogan
        yield types.SimpleNamespace(mygan=ref_mygan, stcnn=ref_stcnn,
                                    convlstm=ref_convlstm,
                                    xception=ref_xception,
                                    anogan=ref_anogan)
    finally:
        sys.path.remove(REF)
