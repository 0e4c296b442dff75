"""Host/platform configuration helpers."""

from __future__ import annotations

import os


def configure_for_host(force_cpu: bool | None = None) -> None:
    """Apply host-robustness settings before heavy JAX use.

    - Platform forcing: on this image the axon TPU plugin overrides the
      `JAX_PLATFORMS` env var; only `jax.config.update("jax_platforms")`
      reliably selects CPU. If the env var asks for cpu (or force_cpu is
      True), honor it at the config level.
    - Synchronous CPU dispatch: JAX's async CPU dispatch can deadlock on
      single-core hosts (arrays never materialize).
    - Persistent compilation cache: slow hosts pay tens of seconds per
      compile; the cache makes repeat runs nearly compile-free.
    """
    import jax

    want_cpu = force_cpu or os.environ.get("JAX_PLATFORMS", "") == "cpu"
    if want_cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:  # backends already initialized
            pass
        jax.config.update("jax_cpu_enable_async_dispatch", False)

    cache_dir = os.environ.get("MULTIVOLUMES_JAX_CACHE", "/tmp/jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
