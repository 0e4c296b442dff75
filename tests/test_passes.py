"""Pass-level invariants: TAA convergence, mesh rasterizer, OIT ordering."""

import numpy as np
import jax
import jax.numpy as jnp

from multivolumes_tpu.render import taa as taa_lib
from multivolumes_tpu.render import mesh as mesh_lib
from multivolumes_tpu.render import composite


# --- TAA -------------------------------------------------------------------

def test_taa_static_scene_converges():
    h, w = 32, 48
    # smooth signal: TAA's neighborhood filter is ~identity on it, so the
    # resolve must converge to the input (noise would be smoothed by design)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    img = jnp.asarray((0.2 + 0.5 * xx + 0.25 * yy).astype(np.float32))
    cur = (img, img * 0.5, img * 0.2, jnp.ones((h, w)))
    vel = (jnp.zeros((h, w)), jnp.zeros((h, w)))
    history = jnp.zeros((4, h, w), jnp.float32)

    step = jax.jit(lambda hist: taa_lib.temporal_aa(cur, hist, vel))
    for _ in range(12):
        (r, g, b), history = step(history)
    # converged output equals the input signal
    np.testing.assert_allclose(np.asarray(r), np.asarray(img), atol=5e-2)
    # history confidence saturates
    assert float(history[3].min()) > 0.5


def test_taa_rejects_stale_history():
    h, w = 16, 16
    cur = (jnp.ones((h, w)), jnp.ones((h, w)), jnp.ones((h, w)),
           jnp.ones((h, w)))
    vel = (jnp.zeros((h, w)), jnp.zeros((h, w)))
    # history holds a wildly different color with full confidence
    history = jnp.stack([
        jnp.zeros((h, w)), jnp.zeros((h, w)), jnp.zeros((h, w)),
        jnp.ones((h, w)),
    ])
    (r, _g, _b), _ = jax.jit(
        lambda: taa_lib.temporal_aa(cur, history, vel)
    )()
    # neighborhood clamp must pull the history toward the current color
    assert float(np.asarray(r).mean()) > 0.5


def test_taa_tm_itm_roundtrip():
    rng = np.random.RandomState(1)
    r, g, b = [jnp.asarray(rng.rand(8, 8).astype(np.float32)) * 5 for _ in range(3)]
    y, co, cg = taa_lib.tm(r, g, b)
    r2, g2, b2 = taa_lib.itm(y, co, cg)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b), rtol=1e-4, atol=1e-5)


# --- mesh rasterizer ---------------------------------------------------------

def test_rasterize_single_triangle():
    # clip-space triangle covering the image center, w = 1 (no perspective)
    verts = jnp.array(
        [
            [-0.5, -0.5, 0.5, 1.0],
            [0.5, -0.5, 0.5, 1.0],
            [0.0, 0.6, 0.5, 1.0],
        ],
        jnp.float32,
    )
    idx = jnp.array([[0, 1, 2]], jnp.int32)
    depth, tri = jax.jit(
        lambda: mesh_lib.rasterize(verts, idx, 32, 32, k=32)
    )()
    depth, tri = np.asarray(depth), np.asarray(tri)
    assert tri[16, 16] == 0            # center covered
    assert abs(depth[16, 16] - 0.5) < 1e-3
    assert tri[1, 1] == -1             # corners empty
    assert depth[1, 1] == 1.0


def test_rasterize_depth_test():
    # two overlapping triangles; nearer one must win
    verts = jnp.array(
        [
            [-0.9, -0.9, 0.8, 1.0], [0.9, -0.9, 0.8, 1.0], [0.0, 0.9, 0.8, 1.0],
            [-0.9, -0.9, 0.3, 1.0], [0.9, -0.9, 0.3, 1.0], [0.0, 0.9, 0.3, 1.0],
        ],
        jnp.float32,
    )
    idx = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    depth, tri = jax.jit(
        lambda: mesh_lib.rasterize(verts, idx, 16, 16, k=16)
    )()
    assert np.asarray(tri)[8, 8] == 1
    assert abs(float(np.asarray(depth)[8, 8]) - 0.3) < 1e-3


# --- OIT layer selection ------------------------------------------------------

def test_select_layers_orders_by_depth():
    key = jnp.asarray(
        np.array(
            [
                np.full((2, 2), 0.7),
                np.full((2, 2), 0.2),
                np.full((2, 2), 3.4e38),   # invalid
                np.full((2, 2), 0.5),
            ],
            np.float32,
        )
    )
    z, idx = jax.jit(lambda: composite._select_layers(key, 3))()
    z, idx = np.asarray(z), np.asarray(idx)
    assert (idx[0] == 1).all() and (idx[1] == 3).all() and (idx[2] == 0).all()
    np.testing.assert_allclose(z[:, 0, 0], [0.2, 0.5, 0.7])


def test_packed_composite_matches_unpacked():
    import jax

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.render import frame as frame_lib
    from multivolumes_tpu.scene import state as state_lib

    cfg = RenderConfig(width=96, height=64, grid_size=16, light_grid_size=8,
                       max_ray_samples=16, max_light_samples=8,
                       num_volumes=2, num_volume_srcs=2,
                       cube_map_size=16, shadow_map_size=32)
    st = state_lib.create_scene(cfg)
    cam = cam_lib.default_camera(cfg.aspect_ratio)
    out_p = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg, use_taa=False))(st)
    cfg_u = cfg.with_(packed_composite=False)
    out_u = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg_u, use_taa=False))(st)
    np.testing.assert_allclose(
        np.asarray(out_p.image), np.asarray(out_u.image), atol=2e-3
    )


def test_bf16_sweep_close_to_f32():
    import jax

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.render import frame as frame_lib
    from multivolumes_tpu.scene import state as state_lib

    cfg = RenderConfig(width=96, height=64, grid_size=16, light_grid_size=8,
                       max_ray_samples=16, max_light_samples=8,
                       num_volumes=2, num_volume_srcs=2,
                       cube_map_size=16, shadow_map_size=32)
    st = state_lib.create_scene(cfg)
    cam = cam_lib.default_camera(cfg.aspect_ratio)
    out32 = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg, use_taa=False))(st)
    cfg16 = cfg.with_(use_bf16=True)
    out16 = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg16, use_taa=False))(st)
    diff = np.abs(np.asarray(out32.image) - np.asarray(out16.image))
    assert diff.mean() < 5e-3, diff.mean()
    assert diff.max() < 6e-2, diff.max()


def test_rasterize_large_triangle_no_holes():
    """Close-up robustness: triangles far larger than the base k x k
    sample grid must still get gap-free coverage (tiered rasterizer)."""
    import jax.numpy as jnp

    from multivolumes_tpu.render import mesh as mesh_lib

    w, h = 320, 320
    # a quad covering most of the viewport, in clip space (w_clip = 1)
    verts = jnp.asarray([
        [-0.8, -0.8, 0.5, 1.0],
        [0.8, -0.8, 0.5, 1.0],
        [0.8, 0.8, 0.5, 1.0],
        [-0.8, 0.8, 0.5, 1.0],
    ], jnp.float32)
    idx = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    depth, tri_id = mesh_lib.rasterize(verts, idx, w, h)
    tri_id = np.asarray(tri_id)
    # interior of the quad: ndc [-0.8, 0.8] -> px [32, 288); margin 4 px
    interior = tri_id[40:280, 40:280]
    holes = (interior < 0).sum()
    assert holes == 0, f"{holes} interior holes"
    d = np.asarray(depth)[40:280, 40:280]
    np.testing.assert_allclose(d, 0.5, atol=1e-4)


def test_rasterize_backface_cull_and_capacity():
    """cull=+1 (the reference's CULL_BACK) must drop negative-area
    triangles and, with a front-capacity, still rasterize every front
    face of a closed box exactly as the uncull path does."""
    import jax.numpy as jnp

    from multivolumes_tpu.render import mesh as mesh_lib

    w, h = 160, 160
    # a clip-space "box": front quad (CCW -> positive screen area, near)
    # and back quad (wound the other way, far)
    verts = jnp.asarray([
        [-0.5, -0.5, 0.3, 1.0], [0.5, -0.5, 0.3, 1.0],
        [0.5, 0.5, 0.3, 1.0], [-0.5, 0.5, 0.3, 1.0],
        [-0.7, -0.7, 0.8, 1.0], [0.7, -0.7, 0.8, 1.0],
        [0.7, 0.7, 0.8, 1.0], [-0.7, 0.7, 0.8, 1.0],
    ], jnp.float32)
    front = [[0, 2, 1], [0, 3, 2]]   # py flips y: this winding is area>0
    back = [[4, 5, 6], [4, 6, 7]]    # reversed -> area<0 (culled)
    idx = jnp.asarray(front + back, jnp.int32)

    d_all, t_all = mesh_lib.rasterize(verts, idx, w, h)
    d_cull, t_cull = mesh_lib.rasterize(
        verts, idx, w, h, cull=1, capacity=3, dense_top=0)
    t_all, t_cull = np.asarray(t_all), np.asarray(t_cull)
    # the front quad's winners agree wherever the uncull path found them
    fr = t_all < 2
    assert fr.any()
    np.testing.assert_array_equal(t_cull[fr], t_all[fr])
    # the culled raster never shows the back quad
    assert (t_cull < 2).all() or (t_cull[t_cull >= 0] < 2).all()
    # and the back quad region outside the front quad is now empty
    only_back = (t_all >= 2)
    assert (t_cull[only_back] == -1).all()


def test_mesh_shade_window_matches_fullscreen():
    """The deferred-shade window (config.mesh_shade_window) must be
    invisible when the mesh's projected bbox fits inside it: color,
    velocity and valid match the full-screen shade exactly."""
    import os

    import pytest

    bunny = "/root/reference/Bin/Assets/bunny.obj"
    if not os.path.exists(bunny):
        pytest.skip("bunny asset missing")

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.engine import MultiRayCaster

    cfg = RenderConfig(
        width=160, height=96, grid_size=16, light_grid_size=8,
        max_ray_samples=32, max_light_samples=8, num_volumes=4,
        num_volume_srcs=2, cube_map_size=16, shadow_map_size=64)
    eng = MultiRayCaster(cfg)
    eng.set_mesh(bunny)
    cam = cam_lib.orbit_camera(0.1, cfg.aspect_ratio)

    # windows apply under the far preset only (near shades full-screen
    # by design — no silent background outside an outgrown window)
    cfg_far = eng.config.with_(raster_preset="far")
    out_full = jax.jit(lambda s: mesh_lib.render_mesh(
        s, cam, cfg_far.with_(mesh_shade_window=0)))(eng.state)
    out_win = jax.jit(lambda s: mesh_lib.render_mesh(
        s, cam, cfg_far.with_(mesh_shade_window=80)))(eng.state)

    v_full = np.asarray(out_full.valid)
    v_win = np.asarray(out_win.valid)
    assert v_full.any(), "mesh not on screen — test config broken"
    np.testing.assert_array_equal(v_win, v_full)
    for c_w, c_f in zip(out_win.color + out_win.velocity,
                        out_full.color + out_full.velocity):
        np.testing.assert_allclose(
            np.asarray(c_w), np.asarray(c_f), atol=1e-6)


def test_rasterize_tail_tier_no_holes():
    """The production ladder's small-triangle tail tier (half the
    emitted set at 2x2) must not open coverage holes vs the plain 4x4
    base on a real mesh at a mid-distance view."""
    import os

    import pytest

    bunny = "/root/reference/Bin/Assets/bunny.obj"
    if not os.path.exists(bunny):
        pytest.skip("bunny asset missing")

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib, math3d
    from multivolumes_tpu.engine import MultiRayCaster

    w, h = 320, 200
    cfg = RenderConfig(
        width=w, height=h, grid_size=16, light_grid_size=8,
        max_ray_samples=32, max_light_samples=8, num_volumes=4,
        num_volume_srcs=2, cube_map_size=16, shadow_map_size=64)
    eng = MultiRayCaster(cfg)
    eng.set_mesh(bunny)
    st = eng.state
    cam = cam_lib.orbit_camera(0.0, cfg.aspect_ratio)
    clip = math3d.transform_point(
        st.mesh_verts[:, :3], st.mesh_world @ cam.view_proj)
    cap = mesh_lib._cull_capacity(st.mesh_indices.shape[0])
    kw = dict(big_tiers=((2048, 12), (128, 48)), cull=1, capacity=cap,
              dense_top=16)
    _, t_base = mesh_lib.rasterize(clip, st.mesh_indices, w, h, **kw)
    _, t_tail = mesh_lib.rasterize(clip, st.mesh_indices, w, h,
                                   tail=(0.5, 2), **kw)
    cov_b = np.asarray(t_base) >= 0
    cov_t = np.asarray(t_tail) >= 0
    assert cov_b.sum() > 500
    holes = (cov_b & ~cov_t).sum()
    assert holes <= 0.003 * cov_b.sum(), (
        f"{holes} holes / {cov_b.sum()} covered")


def test_rasterize_production_ladder_closeup_no_holes():
    """The production ladder (cull + capacity + tail + tightened tiers
    + dense top) must stay essentially hole-free at a CLOSE-UP camera,
    where triangle bboxes are largest and the tier grids sparsest."""
    import os

    import pytest

    bunny = "/root/reference/Bin/Assets/bunny.obj"
    if not os.path.exists(bunny):
        pytest.skip("bunny asset missing")

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib, math3d
    from multivolumes_tpu.engine import MultiRayCaster

    w, h = 400, 300
    cfg = RenderConfig(
        width=w, height=h, grid_size=16, light_grid_size=8,
        max_ray_samples=32, max_light_samples=8, num_volumes=4,
        num_volume_srcs=2, cube_map_size=16, shadow_map_size=64)
    eng = MultiRayCaster(cfg)
    eng.set_mesh(bunny)
    st = eng.state
    # close-up: camera 4x nearer than the demo orbit -> bboxes ~4x bigger
    cam = cam_lib.make_camera(
        jnp.array([2.0, -6.0, -16.0]), jnp.array([0.0, -8.0, 0.0]),
        cfg.aspect_ratio)
    clip = math3d.transform_point(
        st.mesh_verts[:, :3], st.mesh_world @ cam.view_proj)
    cap = mesh_lib._cull_capacity(st.mesh_indices.shape[0])
    # baseline: cull-only at the FULL default ladder. (An uncull
    # baseline is wrong here: the Stanford bunny's base is open, and
    # this camera sees interior backfaces that the reference's
    # CULL_BACK raster state drops identically.)
    _, t_ref = mesh_lib.rasterize(clip, st.mesh_indices, w, h, cull=1)
    cov_r = np.asarray(t_ref) >= 0
    assert cov_r.sum() > 3000, "camera missed the mesh"

    # capacity + tightened tiers + dense top (raster_tail=None): must
    # be hole-free at ANY distance — this is the all-distance contract
    _, t_solid = mesh_lib.rasterize(
        clip, st.mesh_indices, w, h,
        big_tiers=((2048, 10), (128, 36)), cull=1, capacity=cap,
        dense_top=16)
    holes = (cov_r & ~(np.asarray(t_solid) >= 0)).sum()
    assert holes <= 0.005 * cov_r.sum(), (
        f"{holes} holes / {cov_r.sum()} covered")

    # the default tail is a demo-distance trade (config.raster_tail
    # documents it): at this zoom its under-sampling is bounded, not
    # zero — canary so it degrades no further
    _, t_tail = mesh_lib.rasterize(
        clip, st.mesh_indices, w, h,
        big_tiers=((2048, 10), (128, 36)), cull=1, capacity=cap,
        dense_top=16, tail=(0.6, 2))
    holes_t = (cov_r & ~(np.asarray(t_tail) >= 0)).sum()
    assert holes_t <= 0.20 * cov_r.sum(), (
        f"{holes_t} tail holes / {cov_r.sum()} covered")


def test_raster_far_preset_select_and_no_holes():
    """The mesh-derived far tier ladder (config.raster_far_tiers,
    derived at set_mesh) + the host-side preset pick: the demo orbit
    must select "far", a close-up must fall back to "near", and the far
    ladder must stay hole-free at the orbit distance it was sized for
    (projected bbox near raster_far_bound — the contract's worst case)."""
    import os

    import pytest

    bunny = "/root/reference/Bin/Assets/bunny.obj"
    if not os.path.exists(bunny):
        pytest.skip("bunny asset missing")

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib, math3d
    from multivolumes_tpu.engine import MultiRayCaster

    w, h = 320, 200
    # bound 100 px: the orbit projects the bunny at ~83 px here, so the
    # derived tiers run NEAR their design bound (a production-margin
    # test, not an oversized-grid freebie)
    cfg = RenderConfig(
        width=w, height=h, grid_size=16, light_grid_size=8,
        max_ray_samples=32, max_light_samples=8, num_volumes=4,
        num_volume_srcs=2, cube_map_size=16, shadow_map_size=64,
        raster_far_bound=100)
    eng = MultiRayCaster(cfg)
    eng.set_mesh(bunny)
    tiers = eng.config.raster_far_tiers
    assert tiers, "derive_far_tiers produced no ladder for the bunny"
    assert all(kk > 4 for _, kk in tiers)

    # host-side preset pick + hysteresis (orbit eye ~83 px, close ~670)
    assert eng.select_raster_preset((0.0, 6.0, 60.0)) == "far"
    assert eng.select_raster_preset(
        (2.0, -6.0, -16.0), (0.0, -8.0, 0.0)) == "near"
    assert eng.select_raster_preset((0.0, 6.0, 60.0)) == "far"

    st = eng.state
    cap = mesh_lib._cull_capacity(st.mesh_indices.shape[0])
    for t in (0.0, 2.6):
        cam = cam_lib.orbit_camera(t, cfg.aspect_ratio)
        clip = math3d.transform_point(
            st.mesh_verts[:, :3], st.mesh_world @ cam.view_proj)
        _, t_ref = mesh_lib.rasterize(clip, st.mesh_indices, w, h, cull=1)
        cov_r = np.asarray(t_ref) >= 0
        assert cov_r.sum() > 500, "camera missed the mesh"
        # the full production far path: small-tier ladder (k=1 for
        # sub-2 px ranks) + the windowed dense pass
        _, t_far = mesh_lib.rasterize(
            clip, st.mesh_indices, w, h, big_tiers=tiers, cull=1,
            capacity=cap, dense_top=16, tail=cfg.raster_tail,
            small_tiers=eng.config.raster_far_small, dense_window=128)
        holes = (cov_r & ~(np.asarray(t_far) >= 0)).sum()
        assert holes <= 0.005 * cov_r.sum(), (
            f"t={t}: {holes} holes / {cov_r.sum()} covered")


def test_derive_far_tiers_degenerate_and_projected_size():
    """Host-helper edge cases: tiny meshes yield no ladder; a pose with
    the AABB at/behind the near plane reports +inf (always-near)."""
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([[0, 1, 2]], np.int32)
    world = np.eye(4, dtype=np.float32)
    assert mesh_lib.derive_far_tiers(
        verts, idx, world, 1280, 800, 360) is None

    aabb = np.asarray([[-1, -1, -1], [1, 1, 1]], np.float32)
    e = mesh_lib.projected_size_px(aabb, (0.0, 0.0, -50.0),
                                   (0.0, 0.0, 0.0), 1280, 800)
    assert 0 < e < 200
    # eye inside the box -> corners behind the near plane -> inf
    assert mesh_lib.projected_size_px(
        aabb, (0.0, 0.0, 0.0), (0.0, 0.0, 1.0), 1280, 800) == float("inf")


def test_rasterize_dense_top_exact_coverage():
    """dense_top rasterizes the largest triangles analytically: a
    screen-filling quad keeps gap-free coverage even with NO grid tiers
    at all (the old 256x256 top tier had stride > 1 beyond 256 px)."""
    import jax.numpy as jnp

    from multivolumes_tpu.render import mesh as mesh_lib

    w, h = 400, 300
    verts = jnp.asarray([
        [-0.9, -0.9, 0.4, 1.0], [0.9, -0.9, 0.4, 1.0],
        [0.9, 0.9, 0.4, 1.0], [-0.9, 0.9, 0.4, 1.0],
    ], jnp.float32)
    idx = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    depth, tri_id = mesh_lib.rasterize(
        verts, idx, w, h, k=1, big_tiers=(), dense_top=2)
    tri_id = np.asarray(tri_id)
    interior = tri_id[30:270, 40:360]
    assert (interior >= 0).all(), f"{(interior < 0).sum()} holes"
    np.testing.assert_allclose(
        np.asarray(depth)[30:270, 40:360], 0.4, atol=1e-3)


def test_render_frames_scan_matches_sequential():
    """`render_frames` (K frames in ONE lax.scan dispatch — the
    frames-in-flight analog) must carry state identically to K
    sequential `render_frame` calls, for unroll 1 and 2.

    The sequential reference uses the ENGINE's config: the engine bakes
    the shear-warp sweep axis at init (`MultiRayCaster._set_light_axis`,
    config.light_axis), and the static-axis light path is fast-math
    DIFFERENT from the `light_axis=None` 3-branch lax.switch (~5e-4 on
    the image) — comparing across the two configs measures that switch
    inlining, not scan carry drift."""
    import jax

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.engine import MultiRayCaster
    from multivolumes_tpu.render import frame as frame_lib
    from multivolumes_tpu.scene import state as state_lib

    eng = MultiRayCaster(RenderConfig(
        width=96, height=64, grid_size=16, light_grid_size=8,
        max_ray_samples=16, max_light_samples=8,
        num_volumes=4, num_volume_srcs=2,
        cube_map_size=16, shadow_map_size=32))
    cfg = eng.config  # light_axis baked — the production static axis
    st = state_lib.create_scene(cfg)
    k = 3
    cams = [cam_lib.orbit_camera((f + 1) / 60.0, cfg.aspect_ratio)
            for f in range(k)]

    seq_imgs = []
    s = st
    step = jax.jit(lambda s_, c_: frame_lib.render_frame(
        s_, c_, cfg, use_taa=True))
    for c in cams:
        out = step(s, c)
        seq_imgs.append(np.asarray(out.image))
        s = out.state

    cams_stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, 0), *cams)
    for unroll in (1, 2):
        imgs, s_end = jax.jit(
            lambda s_, c_: frame_lib.render_frames(
                s_, c_, cfg, use_taa=True, unroll=unroll)
        )(st, cams_stacked)
        # the throughput API emits planar frames (host converts layout)
        assert imgs.shape == (k, 3, cfg.height, cfg.width)
        for f in range(k):
            np.testing.assert_allclose(
                np.moveaxis(np.asarray(imgs[f]), 0, -1), seq_imgs[f],
                atol=2e-5)
        assert int(s_end.frame_idx) == k

    # the engine's throughput API (render_block) is the same dispatch
    # with the engine's state/jit-cache plumbing (render_block DONATES
    # the state buffers — hand it a copy so `st` stays alive)
    eng.state = jax.tree_util.tree_map(jnp.copy, st)
    imgs = np.asarray(eng.render_block(cams_stacked))
    assert imgs.shape == (k, 3, cfg.height, cfg.width)
    np.testing.assert_allclose(
        np.moveaxis(imgs[-1], 0, -1), seq_imgs[-1], atol=2e-5)
    assert int(eng.state.frame_idx) == k
