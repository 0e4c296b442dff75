"""Scene state, checkpoint round-trip, stats, frame-step integration."""

import numpy as np
import jax
import jax.numpy as jnp

from multivolumes_tpu.config import RenderConfig
from multivolumes_tpu.core import camera as cam_lib
from multivolumes_tpu.render import frame as frame_lib
from multivolumes_tpu.render import cull as cull_lib
from multivolumes_tpu.render.perframe import build_per_object
from multivolumes_tpu.scene import state as state_lib
from multivolumes_tpu.utils import checkpoint, stats


def _small_cfg(**kw):
    base = dict(width=96, height=64, grid_size=16, light_grid_size=8,
                max_ray_samples=16, max_light_samples=8, num_volumes=2,
                num_volume_srcs=2, cube_map_size=16, shadow_map_size=32)
    base.update(kw)
    return RenderConfig(**base)


def test_checkpoint_roundtrip(tmp_path):
    cfg = _small_cfg()
    st = state_lib.create_scene(cfg)
    path = str(tmp_path / "scene.npz")
    checkpoint.save_scene(path, st)
    st2 = checkpoint.load_scene(path)
    for name in ("volumes", "volume_worlds", "light_maps", "sh_coeffs",
                 "taa_history", "frame_idx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st, name)), np.asarray(getattr(st2, name))
        )


def test_frame_step_advances_and_is_resumable(tmp_path):
    cfg = _small_cfg()
    st = state_lib.create_scene(cfg)
    cam = cam_lib.default_camera(cfg.aspect_ratio)
    step = jax.jit(lambda s, c: frame_lib.render_frame(s, c, cfg))

    out1 = step(st, cam)
    assert int(out1.state.frame_idx) == 1
    assert out1.image.shape == (cfg.height, cfg.width, 3)
    assert not np.isnan(np.asarray(out1.image)).any()

    # checkpoint mid-run, resume, and get bitwise-identical frames
    path = str(tmp_path / "ck.npz")
    checkpoint.save_scene(path, out1.state)
    resumed = checkpoint.load_scene(path)
    out_a = step(out1.state, cam)
    out_b = step(resumed, cam)
    np.testing.assert_array_equal(np.asarray(out_a.image),
                                  np.asarray(out_b.image))


def test_frame_stats():
    cfg = _small_cfg()
    st = state_lib.create_scene(cfg)
    cam = cam_lib.default_camera(cfg.aspect_ratio)
    po = build_per_object(st.volume_worlds, cam.view_proj)
    cull = cull_lib.cull_volumes(
        po, cam.eye, jnp.array([96.0, 64.0]), 16, 16, 5
    )
    s = jax.jit(stats.frame_stats)(cull)
    assert int(s.visible) <= 2
    assert int(s.cube_path) + int(s.pixel_path) == int(s.visible)
    assert stats.format_stats(s)


def test_checkpoint_roundtrip_with_mesh_engine(tmp_path):
    """Full engine state incl. the cached shadow map and mesh buffers
    survives a save/load; a resumed render is identical."""
    import os

    import jax

    from multivolumes_tpu.engine import MultiRayCaster

    bunny = "/root/reference/Bin/Assets/bunny.obj"
    cfg = RenderConfig(width=96, height=64, grid_size=16, light_grid_size=8,
                       max_ray_samples=16, max_light_samples=8,
                       num_volumes=2, num_volume_srcs=1, cube_map_size=16,
                       shadow_map_size=32, use_bf16=False)
    eng = MultiRayCaster(cfg)
    if os.path.exists(bunny):
        eng.set_mesh(bunny)
        cfg = eng.config
    eng.render()  # advance once (light maps, TAA history, frame idx)

    path = str(tmp_path / "scene.npz")
    checkpoint.save_scene(path, eng.state)
    restored = checkpoint.load_scene(path)

    img_a = np.asarray(eng.render())
    eng2 = MultiRayCaster(cfg)
    eng2.state = restored
    img_b = np.asarray(eng2.render())
    np.testing.assert_allclose(img_a, img_b, atol=1e-6)
