"""Test configuration: run everything on a virtual 8-device CPU mesh.

The rebuild's analog of the reference's WARP software-adapter path
(`MultiVolumes.cpp:110-128`): a deterministic CPU backend exercising the
exact same jitted code, plus 8 virtual devices so multi-chip sharding logic
is testable without TPU hardware.

NOTE: the `JAX_PLATFORMS` environment variable is overridden by the axon
TPU plugin on this image — only `jax.config.update("jax_platforms", ...)`
reliably forces CPU. Without it, "CPU" tests silently run through the
TPU tunnel, which is slow and can wedge mid-transfer.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Single-core-host robustness: synchronous dispatch + persistent compile
# cache (fresh jit graphs can cost minutes on this box).
jax.config.update("jax_cpu_enable_async_dispatch", False)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
