"""Render the reference's demo configurations to PNGs.

Mirrors `Bin/all4.bat` / `all16.bat` / `all64.bat` (4/16/64 volumes +
bunny mesh + radiance environment) on whatever backend is active.

    python examples/render_gallery.py [--small] [--out docs/gallery]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/gallery")
    p.add_argument("--small", action="store_true",
                   help="reduced resolution/grids (CPU-friendly)")
    p.add_argument("--mesh", default="/root/reference/Bin/Assets/bunny.obj")
    p.add_argument("--frames", type=int, default=6)
    args = p.parse_args()

    from multivolumes_tpu.utils.platform import configure_for_host

    configure_for_host()

    import numpy as np

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.engine import MultiRayCaster
    from multivolumes_tpu.render.postprocess import srgb_encode
    from multivolumes_tpu.utils.png import write_png

    os.makedirs(args.out, exist_ok=True)

    if args.small:
        base = dict(width=320, height=200, grid_size=32, light_grid_size=16,
                    max_ray_samples=64, max_light_samples=16,
                    cube_map_size=32, shadow_map_size=128)
    else:
        base = dict(width=1280, height=800, grid_size=128, light_grid_size=96,
                    max_ray_samples=256, max_light_samples=96,
                    cube_map_size=128, shadow_map_size=1024)

    for n in (4, 16, 64):
        cfg = RenderConfig(num_volumes=n, num_volume_srcs=min(n, 10), **base)
        eng = MultiRayCaster(cfg)
        # every all*.bat includes the bunny mesh
        with_mesh = os.path.exists(args.mesh)
        if with_mesh:
            eng.set_mesh(args.mesh)
        cam = cam_lib.orbit_camera(0.35, cfg.aspect_ratio)
        t0 = time.time()
        img = None
        for _ in range(args.frames):  # let TAA/light maps settle
            img = eng.render(cam)
        out = np.asarray(srgb_encode(img))
        name = f"all{n}{'_mesh' if with_mesh else ''}.png"
        write_png(os.path.join(args.out, name), out)
        print(f"{name}: {out.shape[1]}x{out.shape[0]} in "
              f"{time.time()-t0:.1f}s (mean {out.mean():.3f})")


if __name__ == "__main__":
    main()
