"""Process-level JAX configuration for the CLIs.

- persistent compilation cache (big win for repeated CLI invocations on
  standard backends; the tunneled axon backend caches server-side)
- opt-in CPU forcing via MTS_FORCE_CPU=1 (both the env var and the config
  update are required in this image — see tests/conftest.py)
"""
from __future__ import annotations

import os


def setup():
    import jax

    cache_dir = os.environ.get(
        "MTS_COMPILE_CACHE", os.path.expanduser("~/.cache/mts_jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    if os.environ.get("MTS_FORCE_CPU") == "1":
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
