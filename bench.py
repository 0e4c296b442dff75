"""Benchmark: full-pipeline frame time on the all64 demo workload.

Mirrors the reference's 64-volume demo config (`Bin/all64.bat`:
`-mesh Assets/bunny.obj 0.0 -9.0 0.0 1.8 -radiance ... -numVolumes 64`)
at the default 1280x800 window, with the orbit-camera animation ([A])
driving per-frame matrix updates. The radiance environment is the
engine's procedural probe (the snapshot ships no LA_Radiance.dds); the
bunny mesh loads from the reference assets when present.

The reference publishes no numbers (BASELINE.md); vs_baseline is
frame-FPS / 60 — the real-time target at its default window.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} plus a
secondary p50/p95 line on stderr (BASELINE.md measurement ladder).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

_BUNNY = "/root/reference/Bin/Assets/bunny.obj"


def main() -> None:
    from multivolumes_tpu.utils.platform import configure_for_host

    configure_for_host()
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.engine import MultiRayCaster
    from multivolumes_tpu.render import frame as frame_lib
    from multivolumes_tpu.utils.timing import readback_latency, sync

    if on_tpu:
        # the all64.bat north-star workload (BASELINE.md)
        cfg = RenderConfig(
            width=1280, height=800, grid_size=128, light_grid_size=96,
            max_ray_samples=256, max_light_samples=96,
            num_volumes=64, num_volume_srcs=10,
            cube_map_size=128, shadow_map_size=1024,
        )
        frames = 16
    else:
        cfg = RenderConfig(
            width=320, height=200, grid_size=32, light_grid_size=16,
            max_ray_samples=64, max_light_samples=16,
            num_volumes=4, num_volume_srcs=2,
            cube_map_size=32, shadow_map_size=64,
        )
        frames = 3

    engine = MultiRayCaster(cfg)
    has_mesh = os.path.exists(_BUNNY)
    if has_mesh:
        engine.set_mesh(_BUNNY)
    cfg = engine.config

    def step(state, camera):
        out = frame_lib.render_frame(state, camera, cfg, use_taa=True)
        return out.image, out.state

    step_jit = jax.jit(step)
    state = engine.state

    # warmup / compile (animated camera as in the demo's [A] toggle)
    camera = cam_lib.orbit_camera(0.0, cfg.aspect_ratio)
    img, state = step_jit(state, camera)
    sync(img)
    lat = readback_latency()

    # headline: amortized frame time over an animated run, single sync
    t0 = time.perf_counter()
    for f in range(frames):
        camera = cam_lib.orbit_camera((f + 1) / 60.0, cfg.aspect_ratio)
        img, state = step_jit(state, camera)
    sync(img)
    dt = (time.perf_counter() - t0 - lat / 1e3) / frames

    # secondary: per-frame p50/p95 (each frame synced; readback subtracted)
    per_frame = []
    for f in range(frames):
        camera = cam_lib.orbit_camera((frames + f + 1) / 60.0,
                                      cfg.aspect_ratio)
        t1 = time.perf_counter()
        img, state = step_jit(state, camera)
        sync(img)
        per_frame.append((time.perf_counter() - t1) * 1e3 - lat)
    per_frame.sort()
    p50 = per_frame[len(per_frame) // 2]
    p95 = per_frame[min(len(per_frame) - 1, int(len(per_frame) * 0.95))]
    print(
        f"p50 {p50:.1f} ms  p95 {p95:.1f} ms  "
        f"(readback latency {lat:.1f} ms subtracted; mesh={has_mesh})",
        file=sys.stderr,
    )

    fps = 1.0 / dt
    mesh_tag = "" if has_mesh else "_nomesh"
    print(
        json.dumps(
            {
                "metric": (
                    f"frame_fps_64vol_all64_demo{mesh_tag}_{platform}"
                    if on_tpu else f"frame_fps_small_{platform}"
                ),
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
