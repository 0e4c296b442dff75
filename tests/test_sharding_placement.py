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


def test_sharded_light_stacks_memory_scaling():
    """config.shard_light_stacks (SURVEY section 2.6 TP row, VERDICT r4
    missing item 3): the light stacks shard over the volume axis —
    per-device bytes 1/D of replicated, the sweep reads its LOCAL shard
    (placement_check's no-collective-bigger-than-the-cube-gather
    assertion now also pins that no light stack ever moves), and the
    rendered frame is BIT-IDENTICAL to the replicated-stack path."""
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
        "import numpy as np\n"
        "from multivolumes_tpu.parallel import sharding as sh\n"
        "from multivolumes_tpu.config import RenderConfig\n"
        "from multivolumes_tpu.core import camera as cam_lib\n"
        "from multivolumes_tpu.scene import state as state_lib\n"
        "r = sh.placement_check(8, shard_light=True)\n"
        "assert r['largest_elems'] <= r['cube_gather_elems']\n"
        "cfg = RenderConfig(width=96, height=64, grid_size=16,\n"
        "    light_grid_size=8, max_ray_samples=16, max_light_samples=8,\n"
        "    num_volumes=8, num_volume_srcs=2, cube_map_size=16,\n"
        "    shadow_map_size=32, shard_light_stacks=True)\n"
        "mesh = sh.make_mesh(8)\n"
        "cam = cam_lib.default_camera(cfg.aspect_ratio)\n"
        "st = sh.shard_state(state_lib.create_scene(cfg), mesh,\n"
        "                    shard_light=True)\n"
        "shard = st.light_maps_oriented.addressable_shards[0]\n"
        "assert shard.data.shape[0] == st.light_maps_oriented.shape[0] // 8\n"
        "img, st2 = sh.make_sharded_step(cfg, mesh)(st, cam)\n"
        "cfg_r = cfg.with_(shard_light_stacks=False)\n"
        "img_r, _ = sh.make_sharded_step(cfg_r, mesh)(\n"
        "    sh.shard_state(state_lib.create_scene(cfg_r), mesh), cam)\n"
        "d = float(np.abs(np.asarray(img) - np.asarray(img_r)).max())\n"
        "assert d == 0.0, d\n"
        "s2 = st2.light_maps_oriented.addressable_shards[0]\n"
        "assert s2.data.shape[0] == st2.light_maps_oriented.shape[0] // 8\n"
        "print('shard-light ok')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (
        f"shard-light check failed:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-4000:]}"
    )
    assert "shard-light ok" in proc.stdout
