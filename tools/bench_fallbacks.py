"""One recorded number each for the reference fallback paths.

The production engine runs the sweep light/march paths; two configs drop
to the faithful REFERENCE-semantics twins, whose cost had only ever been
described as "minutes per frame" (VERDICT r4 weak item 6):

* `light_mode="reference"` — the N^2-coupled per-voxel gather light
  march (`render/lightmarch.py`, anchor `CSRayMarchL.hlsl`; forced by
  `config.point_light` and by rotated/anisotropic volume worlds). One
  volume refreshes per frame (the reference's exact cadence), so the
  number below is that one-volume march + the frame around it.
* `march_mode="reference"` — the per-pixel gather view march + gather
  composite (`render/raymarch.py` / `composite.py`, anchors
  `CSRayMarch.hlsl:77-158`, `RayCast.hlsli:43-108`).

    python tools/bench_fallbacks.py [--volumes 8] [--frames 2]

Record the two ms/frame numbers in docs/ARCHITECTURE.md ("Reference
fallback path cost"). Volume count is configurable because the
reference light march is O(N^2) in volumes — state it with the number.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_BUNNY = "/root/reference/Bin/Assets/bunny.obj"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--volumes", type=int, default=8)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--no-mesh", action="store_true")
    args = ap.parse_args()

    from multivolumes_tpu.utils.platform import configure_for_host

    configure_for_host()

    import jax

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.engine import MultiRayCaster
    from multivolumes_tpu.render import frame as frame_lib
    from multivolumes_tpu.utils.timing import readback_latency, sync

    base = RenderConfig(
        width=args.width, height=args.height, grid_size=args.grid,
        light_grid_size=96, max_ray_samples=256, max_light_samples=96,
        num_volumes=args.volumes, num_volume_srcs=min(args.volumes, 10),
        cube_map_size=128, shadow_map_size=1024,
    )

    cases = {
        # point light forces the reference light march
        # (`CSRayMarchL.hlsl:87-92` _POINT_LIGHT_)
        "light_reference_point": base.with_(point_light=True,
                                            light_mode="reference"),
        # per-pixel RayCast expert + gather composite
        "march_reference_raycast": base.with_(march_mode="reference",
                                              composite_mode="gather",
                                              packed_composite=False),
    }

    for name, cfg in cases.items():
        eng = MultiRayCaster(cfg)
        if not args.no_mesh and os.path.exists(_BUNNY):
            eng.set_mesh(_BUNNY)
            eng.select_raster_preset((0.0, 6.0, 60.0))
        cfg = eng.config
        state = eng.state

        # The per-pixel RayCast frame is ONE multi-second dispatch at
        # this scale, which crashes the remote TPU worker (the
        # fidelity-run failure mode); render it in row BANDS via
        # off-center projections (cam_lib.band_camera — exactness
        # pinned by tests/test_fidelity.py), one synced dispatch each.
        # TAA is banded-incompatible (history carry), so the march case
        # measures the frame without it — its cost is the march.
        bands = (max(int(os.environ.get("MV_FB_BANDS", "8")), 1)
                 if name.startswith("march") else 1)
        cfg_band = cfg.with_(height=cfg.height // bands) \
            if bands > 1 else cfg

        def step(s, cam, cfg=cfg_band, taa=(bands == 1)):
            out = frame_lib.render_frame(s, cam, cfg, use_taa=taa,
                                         planar=True)
            return out.image, out.state

        step_jit = jax.jit(step, donate_argnums=(0,))

        def frame(s, f):
            cam0 = cam_lib.orbit_camera(f / 60.0, cfg.aspect_ratio)
            img = None
            for k in range(bands):
                cam = (cam_lib.band_camera(cam0, k, bands)
                       if bands > 1 else cam0)
                img, s = step_jit(s, cam)
                sync(img)  # bound in-flight work to one dispatch
            return img, s

        t0 = time.perf_counter()
        img, state = frame(state, 0)
        compile_s = time.perf_counter() - t0
        lat = readback_latency()
        t0 = time.perf_counter()
        for f in range(args.frames):
            img, state = frame(state, f + 1)
        dt = ((time.perf_counter() - t0) * 1e3
              - lat * bands * args.frames) / args.frames
        print(f"{name}: {dt:.1f} ms/frame "
              f"(n={cfg.num_volumes}, {cfg.width}x{cfg.height}, "
              f"grid {cfg.grid_size}, mesh={cfg.show_mesh}, "
              f"{args.frames} frames, {bands} band(s), "
              f"compile+first {compile_s:.0f} s)")


if __name__ == "__main__":
    main()
