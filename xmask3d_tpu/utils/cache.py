"""Persistent XLA compilation cache — first compiles of the SD-scale model
take minutes; cached reruns are near-instant. Enabled by every entry point.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "") -> None:
    import jax

    path = path or os.environ.get(
        "XMASK3D_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "xmask3d_jax"),
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the flags
