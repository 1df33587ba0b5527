"""Runtime knobs: persistent compilation cache.

Remote/tunnelled TPU attachments (and large fused steps generally) have
multi-minute XLA compile times; the persistent cache makes second runs
near-instant.  Called by bench.py, __graft_entry__ and the CLIs.
Disable with VFD_NO_COMP_CACHE=1.
"""

from __future__ import annotations

import os


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
