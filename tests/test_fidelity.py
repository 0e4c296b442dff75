"""End-to-end fidelity gate: production fast path vs reference semantics.

BASELINE.md budgets "within 1e-2 of the DX12 reference". The DX12 exe
cannot run here and its volume assets are stripped, so the attainable
anchor is the reference-SEMANTICS twin chain — gather march
(`CSRayMarch.hlsl:77-158`), per-volume gather light march
(`CSRayMarchL.hlsl`), CubeCast gather composite (`PSCube.hlsli:51-108`),
all f32 — rendered through the SAME full frame function as the
production path (bf16 plane-sweep march + amortized shear-warp light +
Pallas tile composite). This is the one-number accumulated-deviation
check the per-component tests (test_sweep / test_lightsweep / test_warp)
cannot provide.

The reference light march amortizes one volume per frame, so the twin
warms up for N frames (all maps marched) before the comparison frame.
"""

import numpy as np
import jax

from multivolumes_tpu.config import RenderConfig
from multivolumes_tpu.core import camera as cam_lib
from multivolumes_tpu.render import frame as frame_lib
from multivolumes_tpu.scene import state as state_lib

_FAST = RenderConfig(
    width=160, height=96, grid_size=16, light_grid_size=8,
    max_ray_samples=24, max_light_samples=8,
    num_volumes=4, num_volume_srcs=2, cube_map_size=16,
    shadow_map_size=64,
)  # production defaults: sweep march (bf16), sweep light, tile composite


def _render(cfg, warmup_frames, camera):
    state = state_lib.create_scene(cfg)
    step = jax.jit(lambda s, c: frame_lib.render_frame(
        s, c, cfg, use_taa=False))
    for f in range(warmup_frames):
        out = step(state, cam_lib.orbit_camera(f / 60.0, cfg.aspect_ratio))
        state = out.state
    return np.asarray(step(state, camera).image)


def test_full_frame_fast_vs_reference_semantics():
    cfg_ref = _FAST.with_(
        march_mode="reference", light_mode="reference",
        composite_mode="gather", packed_composite=False, use_bf16=False,
    )
    camera = cam_lib.orbit_camera(0.35, _FAST.aspect_ratio)

    # warm the reference twin until every volume's light map is marched
    ref = _render(cfg_ref, cfg_ref.num_volumes, camera)
    fast = _render(_FAST, 0, camera)

    diff = np.abs(fast - ref)
    covered = diff.max(-1) > 0  # pixels either path touched differently
    mean_all = diff.mean()
    p99 = np.percentile(diff, 99)
    assert mean_all < 1e-2, f"fidelity gate: mean {mean_all:.2e}"
    assert p99 < 5e-2, f"fidelity gate: p99 {p99:.2e} max {diff.max():.2e}"
    # the scene must actually exercise the volume path
    assert covered.mean() > 0.05


def test_tile_composite_adversarial_near_camera():
    """8+ near-camera volumes with near-full-screen footprints: the warp
    path clipped footprints to per-volume tiles here (round-2 weak item
    5); the tile kernel's per-tile lists have full capacity N, so the
    production composite must stay within the gather path's tolerance
    with every footprint overlapping most of the screen."""
    import dataclasses

    import jax.numpy as jnp

    cfg = RenderConfig(
        width=128, height=96, grid_size=16, light_grid_size=8,
        max_ray_samples=16, max_light_samples=8,
        num_volumes=9, num_volume_srcs=2, cube_map_size=16,
        shadow_map_size=32, use_bf16=False, packed_composite=False,
        composite_mode="gather",
    )
    st = state_lib.create_scene(cfg)
    # cluster all 9 volumes right in front of the default camera
    rng = np.random.RandomState(7)
    worlds = np.zeros((9, 4, 4), np.float32)
    for i in range(9):
        s = 6.0 + rng.rand() * 4.0
        worlds[i] = np.eye(4)
        worlds[i, 0, 0] = worlds[i, 1, 1] = worlds[i, 2, 2] = s * 0.5
        worlds[i, 3, :3] = rng.randn(3) * 2.0
    st = dataclasses.replace(st, volume_worlds=jnp.asarray(worlds))
    cam = cam_lib.default_camera(cfg.aspect_ratio)

    out_g = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg, use_taa=False))(st)
    cfg_t = cfg.with_(composite_mode="tile")
    out_t = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg_t, use_taa=False))(st)
    diff = np.abs(np.asarray(out_g.image) - np.asarray(out_t.image))
    assert diff.mean() < 3e-3, diff.mean()
    assert np.percentile(diff, 99.5) < 3e-2, np.percentile(diff, 99.5)
