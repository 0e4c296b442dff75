"""Frame-graph smoke across tricky configurations.

A fuller 15-case matrix ran clean during round 2; these pin the cases
most likely to regress: non-square volume grids (the reference's
SetVolumesWorld quirk), viewports that are not tile-aligned (Pallas
padding paths), and reduced-resolution compositing."""

import jax
import numpy as np
import pytest

from multivolumes_tpu.config import RenderConfig
from multivolumes_tpu.core import camera as cam_lib
from multivolumes_tpu.render import frame as frame_lib
from multivolumes_tpu.scene import state as state_lib

_BASE = dict(width=96, height=64, grid_size=16, light_grid_size=8,
             max_ray_samples=16, max_light_samples=8,
             num_volumes=2, num_volume_srcs=2, cube_map_size=16,
             shadow_map_size=32, use_bf16=False)


@pytest.mark.parametrize("over", [
    {"num_volumes": 5},                    # non-square grid layout
    {"width": 100, "height": 52},          # unaligned viewport
    {"composite_scale": 2},                # half-res composite + upsample
], ids=["nonsquare-n", "odd-viewport", "half-res-composite"])
def test_frame_renders(over):
    cfg = RenderConfig(**{**_BASE, **over})
    st = state_lib.create_scene(cfg)
    cam = cam_lib.orbit_camera(0.1, cfg.aspect_ratio)
    out = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg, use_taa=True))(st)
    img = np.asarray(out.image)
    assert np.isfinite(img).all()
    assert img.std() > 1e-5  # actually rendered content
