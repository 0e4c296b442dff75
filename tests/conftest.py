"""Test configuration: run everything on a virtual 8-device CPU mesh.

The rebuild's analog of the reference's WARP software-adapter path
(`MultiVolumes.cpp:110-128`): a deterministic CPU backend exercising the
exact same jitted code, plus 8 virtual devices so multi-chip sharding logic
is testable without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

# On 1-core hosts JAX's async CPU dispatch can wedge the runtime (eager
# arrays never materialize; np.asarray blocks forever). Synchronous
# dispatch is reliable and, on one core, just as fast.
jax.config.update("jax_cpu_enable_async_dispatch", False)

# This host is 1-core with very slow IO: every tiny eager-op compile costs
# seconds. The persistent cache makes reruns nearly compile-free.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
