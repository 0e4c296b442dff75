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
