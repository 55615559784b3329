"""Persistent XLA compilation cache for the CLI entry points.

The full train step is a large XLA program (Pallas blend kernels + sort +
autodiff); a cold compile on the remote-attached TPU backend can take many
minutes. Caching compiled executables on disk makes every run after the
first start in seconds. Opt out with FOURDGS_NO_COMPILE_CACHE=1; relocate
with FOURDGS_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable(default_dir: str | None = None) -> None:
    if os.environ.get("FOURDGS_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = (
        os.environ.get("FOURDGS_COMPILE_CACHE_DIR")
        or default_dir
        or os.path.join(
            os.path.expanduser("~"), ".cache", "fourdgs_tpu", "xla"
        )
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs — run uncached
