"""Multi-chip placement proof (VERDICT round-2 item 5).

Output equality alone cannot distinguish a partitioned sweep from a
replicated one; this test compiles the sharded step on the 8-virtual-
device CPU mesh and asserts the post-SPMD collective pattern of the
SURVEY section-2.6 plan:

* the view sweep runs inside a shard_map manual region (partitioned by
  construction), so its sharded cube-map output MUST all-gather into the
  replicated screen composite — that all-gather has to exist;
* no collective moves more than that (~0.8 MB/volume at demo scale):
  a bigger one means the oriented volume/light stacks are being gathered
  or scatter-reduced per frame, which would void multi-chip scaling.

Runs in a clean subprocess (the axon TPU plugin claims the backend at
first jax init in-process; see __graft_entry__.dryrun_multichip).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sharded_sweep_collective_pattern():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)

    code = (
        "from multivolumes_tpu.utils.platform import configure_for_host\n"
        "configure_for_host(force_cpu=True)\n"
        "from multivolumes_tpu.parallel import sharding\n"
        "r = sharding.placement_check(8)\n"
        "print('largest', r['largest_elems'],"
        " 'cube', r['cube_gather_elems'])\n"
        "print('placement ok')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (
        f"placement check failed:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-4000:]}"
    )
    assert "placement ok" in proc.stdout
