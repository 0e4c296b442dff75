"""Host/platform configuration helpers."""

from __future__ import annotations

import os


def configure_for_host() -> None:
    """Apply host-robustness settings before heavy JAX use.

    - Synchronous CPU dispatch: on single-core hosts JAX's async CPU
      dispatch can deadlock the runtime (arrays never materialize).
    - Persistent compilation cache: slow hosts pay tens of seconds per
      compile; the cache makes repeat runs nearly compile-free.
    """
    import jax

    if jax.default_backend() == "cpu" or os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_cpu_enable_async_dispatch", False)
    cache_dir = os.environ.get("MULTIVOLUMES_JAX_CACHE", "/tmp/jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
