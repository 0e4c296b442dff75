"""Benchmark: full-pipeline frame time on the demo workload.

Headline metric mirrors the reference's only performance signal — FPS of
the demo configs (`Bin/all4.bat` etc.; the reference publishes no numbers,
see BASELINE.md). We report the 4-volume full-pipeline config, scaled
down in sample counts when running on narrow hosts.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is frame-FPS / 60 (the reference's real-time target at its
default window, BASELINE.md "implied target").
"""

from __future__ import annotations

import json
import time

import jax


def main() -> None:
    from multivolumes_tpu.utils.platform import configure_for_host

    configure_for_host()
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.render import frame as frame_lib
    from multivolumes_tpu.scene import state as state_lib

    if on_tpu:
        # 64-volume demo config (all64.bat) at the reference's default
        # window — the BASELINE.md north-star workload.
        cfg = RenderConfig(
            width=1280, height=800, grid_size=128, light_grid_size=96,
            max_ray_samples=256, max_light_samples=96,
            num_volumes=64, num_volume_srcs=10,
            cube_map_size=128, shadow_map_size=1024,
        )
        frames = 8
    else:
        cfg = RenderConfig(
            width=320, height=200, grid_size=32, light_grid_size=16,
            max_ray_samples=64, max_light_samples=16,
            num_volumes=4, num_volume_srcs=2,
            cube_map_size=32, shadow_map_size=64,
        )
        frames = 3

    state = state_lib.create_scene(cfg)

    def step(state, camera):
        out = frame_lib.render_frame(state, camera, cfg, use_taa=True)
        return out.image, out.state

    step_jit = jax.jit(step)

    import numpy as np

    def sync(x):
        # block_until_ready is not a real sync on tunneled runtimes; a
        # readback is.
        return float(np.asarray(x.ravel()[0]))

    # warmup / compile
    camera = cam_lib.orbit_camera(0.0, cfg.aspect_ratio)
    img, state = step_jit(state, camera)
    sync(img)

    t0 = time.perf_counter()
    for f in range(frames):
        camera = cam_lib.orbit_camera((f + 1) / 60.0, cfg.aspect_ratio)
        img, state = step_jit(state, camera)
    sync(img)
    dt = (time.perf_counter() - t0) / frames

    fps = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": f"frame_fps_64vol_full_pipeline_{platform}",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
