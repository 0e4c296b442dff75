"""Warp composite: homography exactness and parity with the gather path."""

import numpy as np
import jax
import jax.numpy as jnp

from multivolumes_tpu.core import camera as cam_lib
from multivolumes_tpu.core import math3d
from multivolumes_tpu.render import composite, warp
from multivolumes_tpu.render.perframe import build_per_object


def _world(pos, scale):
    w = np.eye(4, dtype=np.float32)
    w[0, 0] = w[1, 1] = w[2, 2] = scale
    w[3, :3] = pos
    return jnp.asarray(w[None])


def test_face_homography_matches_exit_uv():
    """u,v from the homography == dir_to_face_uv of the analytic exit
    point, for every screen point whose exit face matches."""
    cam = cam_lib.orbit_camera(0.7, 1.25)
    worlds = _world((3.0, -2.0, 5.0), 6.0)
    po = build_per_object(worlds, cam.view_proj)

    a_mat = warp.screen_basis(cam.screen_to_world, cam.eye)
    b_mat = a_mat @ po.world_i[0, :3, :3]
    o = math3d.transform_point3(cam.eye, po.world_i)[0]

    xs = np.linspace(-0.9, 0.9, 33, dtype=np.float32)
    xg, yg = np.meshgrid(xs, xs, indexing="xy")
    dl = np.stack(
        [xg * np.asarray(b_mat)[0, j] + yg * np.asarray(b_mat)[1, j]
         + np.asarray(b_mat)[2, j] for j in range(3)]
    )
    on = np.asarray(o)
    hit, t_exit = composite._ray_box_exit_soa(
        *(jnp.full(xg.shape, c) for c in on), *map(jnp.asarray, dl)
    )
    hit, t_exit = np.asarray(hit), np.asarray(t_exit)
    e = on[:, None, None] + dl * t_exit
    face, u, v = (np.asarray(t) for t in
                  composite.dir_to_face_uv_soa(*map(jnp.asarray, e)))

    checked = 0
    for f in range(6):
        nu, nv, den = warp.face_homography(b_mat, o, f)
        nu, nv, den = np.asarray(nu), np.asarray(nv), np.asarray(den)
        q = lambda c: c[0] * xg + c[1] * yg + c[2]
        mask = hit & (face == f) & (np.abs(q(den)) > 1e-6)
        if not mask.any():
            continue
        np.testing.assert_allclose(
            (q(nu) / q(den))[mask], u[mask], atol=2e-4)
        np.testing.assert_allclose(
            (q(nv) / q(den))[mask], v[mask], atol=2e-4)
        checked += mask.sum()
    assert checked > 100  # the box must actually cover screen points


def test_warp_face_matches_bilinear():
    """warp_face == direct bilinear cube sampling on matching-face pixels."""
    s = 32
    cam = cam_lib.default_camera(1.0)
    worlds = _world((0.0, 0.0, 0.0), 8.0)
    po = build_per_object(worlds, cam.view_proj)

    rng = np.random.RandomState(3)
    # smooth per-face images (bilinear and the 2-pass tent agree exactly
    # only for the same sample positions; smoothness keeps the sub-texel
    # pass-decomposition difference tiny)
    base = rng.rand(1, 6, 4, 5, 5).astype(np.float32)
    color = np.asarray(jax.image.resize(jnp.asarray(base), (1, 6, 4, s, s),
                                        "cubic"))
    color_j = jnp.asarray(color)

    a_mat = warp.screen_basis(cam.screen_to_world, cam.eye)
    b_mat = a_mat @ po.world_i[0, :3, :3]
    o = math3d.transform_point3(cam.eye, po.world_i)[0]

    ht = wt = 48
    xg = jnp.linspace(-0.5, 0.5, wt)
    yg = jnp.linspace(0.5, -0.5, ht)
    n_eff = jnp.asarray(float(s))

    # analytic exit points on the tile
    xm, ym = np.meshgrid(np.asarray(xg), np.asarray(yg), indexing="xy")
    bm = np.asarray(b_mat)
    dl = np.stack([xm * bm[0, j] + ym * bm[1, j] + bm[2, j]
                   for j in range(3)])
    on = np.asarray(o)
    hit, t_exit = composite._ray_box_exit_soa(
        *(jnp.full(xm.shape, c) for c in on), *map(jnp.asarray, dl)
    )
    e = on[:, None, None] + np.asarray(dl) * np.asarray(t_exit)
    face = np.asarray(composite.dir_to_face_uv_soa(*map(jnp.asarray, e))[0])

    want = np.stack(composite.sample_cube_soa(
        color_j, jnp.zeros(xm.shape, jnp.int32),
        jnp.asarray(e[0]), jnp.asarray(e[1]), jnp.asarray(e[2]),
        jnp.full(xm.shape, s, jnp.int32),
    ))

    checked = 0
    for f in range(6):
        mask = np.asarray(hit) & (face == f)
        if not mask.any():
            continue
        nu, nv, den = warp.face_homography(b_mat, o, f)
        p_u = n_eff * nu - 0.5 * den
        p_v = n_eff * nv - 0.5 * den
        got = np.asarray(jax.jit(warp.warp_face)(
            color_j[0, f], p_u, p_v, den, xg, yg))
        diff = np.abs(got - want)[:, mask]
        # rectified pass-2 faces carry sub-texel cell-crossing residuals
        # (see warp_face); dense-fallback faces are tap-exact. Bound the
        # tail and the bulk inside BASELINE.md's 1e-2 fidelity budget.
        assert diff.max() < 3e-2, (f, diff.max())
        assert np.percentile(diff, 95) < 1e-2, (f, np.percentile(diff, 95))
        checked += mask.sum()
    assert checked > 500


def test_warp_composite_matches_gather():
    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.render import frame as frame_lib
    from multivolumes_tpu.scene import state as state_lib

    cfg = RenderConfig(width=96, height=64, grid_size=16, light_grid_size=8,
                       max_ray_samples=16, max_light_samples=8,
                       num_volumes=3, num_volume_srcs=2,
                       cube_map_size=16, shadow_map_size=32,
                       use_bf16=False, packed_composite=False,
                       composite_mode="gather")
    st = state_lib.create_scene(cfg)
    cam = cam_lib.default_camera(cfg.aspect_ratio)
    out_g = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg, use_taa=False))(st)
    cfg_w = cfg.with_(composite_mode="warp", warp_tile=128)
    out_w = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg_w, use_taa=False))(st)
    diff = np.abs(np.asarray(out_g.image) - np.asarray(out_w.image))
    assert diff.mean() < 3e-3, diff.mean()
    assert np.percentile(diff, 99.5) < 3e-2, np.percentile(diff, 99.5)


def test_tile_composite_pass_windows_vs_gather():
    """Pin the tile kernel's static pass-2/K-insert row windows: at
    cube_map_size 32 with mixed LOD buckets the quarter/half/full
    tile-row variants all fire; the output must still match the
    per-pixel gather composite."""
    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.render import frame as frame_lib
    from multivolumes_tpu.scene import state as state_lib

    cfg = RenderConfig(width=128, height=96, grid_size=16,
                       light_grid_size=8,
                       max_ray_samples=24, max_light_samples=8,
                       num_volumes=12, num_volume_srcs=2,
                       cube_map_size=32, shadow_map_size=32,
                       use_bf16=False, packed_composite=False,
                       composite_mode="gather")
    st = state_lib.create_scene(cfg)
    cam = cam_lib.orbit_camera(0.3, cfg.aspect_ratio)
    out_g = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg, use_taa=False))(st)
    cfg_t = cfg.with_(composite_mode="tile")
    out_t = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg_t, use_taa=False))(st)
    diff = np.abs(np.asarray(out_g.image) - np.asarray(out_t.image))
    assert diff.mean() < 3e-3, diff.mean()
    assert np.percentile(diff, 99.5) < 3e-2, np.percentile(diff, 99.5)


def test_tile_composite_rowwin_bit_equal():
    """The static pass-2/K-insert row windows (MV_CKERNEL_ROWWIN,
    default ON) must reproduce the full-tile kernel's output (the
    pl.when-selected static window always covers the live rows, see
    composite_kernel._row_window_variants). On the REAL Mosaic backend
    the two are bit-identical (verified on v5e 2026-08-20: windowed vs
    full max |diff| = 0.0 at the 12-volume config). On the CPU
    interpret path XLA contracts FMAs differently for the two graph
    shapes (the windowed variant recomputes vt on the sub-window), so
    this gate allows 1-ulp-scale drift — a dropped live row would show
    up as O(0.1) pixel error, 3 orders of magnitude above the bound."""
    import os

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.ops.pallas.composite_kernel import (
        tile_composite_pallas,
    )
    from multivolumes_tpu.render import frame as frame_lib
    from multivolumes_tpu.scene import state as state_lib

    cfg = RenderConfig(width=128, height=96, grid_size=16,
                       light_grid_size=8,
                       max_ray_samples=24, max_light_samples=8,
                       num_volumes=12, num_volume_srcs=2,
                       cube_map_size=32, shadow_map_size=32,
                       use_bf16=False)
    st = state_lib.create_scene(cfg)
    cam = cam_lib.orbit_camera(0.3, cfg.aspect_ratio)

    def render():
        # fresh outer lambda -> fresh trace; clearing the inner jit's
        # cache makes it re-read the env knob during that trace
        tile_composite_pallas.clear_cache()
        out = jax.jit(lambda s: frame_lib.render_frame(
            s, cam, cfg, use_taa=False))(st)
        return np.asarray(out.image)

    prev = os.environ.get("MV_CKERNEL_ROWWIN")
    try:
        os.environ["MV_CKERNEL_ROWWIN"] = "1"
        on = render()
        os.environ["MV_CKERNEL_ROWWIN"] = "0"
        off = render()
    finally:
        if prev is None:
            os.environ.pop("MV_CKERNEL_ROWWIN", None)
        else:
            os.environ["MV_CKERNEL_ROWWIN"] = prev
        tile_composite_pallas.clear_cache()
    if jax.default_backend() == "cpu":
        np.testing.assert_allclose(on, off, atol=2e-4, rtol=0)
    else:
        np.testing.assert_array_equal(on, off)


def test_tile_composite_depth_weights_fix_seams():
    """VERDICT round-3 item 5: the paper's depth-aware CubeCast weights
    (`PSCube.hlsli:51-108`) must run on the PRODUCTION tile path. The
    seam region is defined by the reference filter itself: pixels where
    the gather twin's depth weights change its own output (the mesh
    pokes through a volume's exit face, so adjacent cube texels hold
    marches truncated at different depths). There, the depth-weighted
    tile kernel must track the twin strictly better than the plain-tent
    kernel (MV_CKERNEL_DEPTHW=0) — the bound is one the plain kernel
    FAILS. (The kernel weights v taps exactly and u-interpolates the
    tap depth — see composite_kernel._make_kernel — so tracking is
    bounded-better, not bit-equal.)"""
    import os

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.engine import MultiRayCaster
    from multivolumes_tpu.ops.pallas.composite_kernel import (
        tile_composite_pallas,
    )
    from multivolumes_tpu.render import frame as frame_lib

    bunny = "/root/reference/Bin/Assets/bunny.obj"
    if not os.path.exists(bunny):
        return
    cfg = RenderConfig(width=128, height=96, grid_size=16, light_grid_size=8,
                       max_ray_samples=16, max_light_samples=8,
                       num_volumes=2, num_volume_srcs=1,
                       cube_map_size=16, shadow_map_size=64,
                       use_bf16=False, packed_composite=False,
                       composite_mode="gather",
                       # big bunny poking through the right volume's
                       # faces (volume at x=+7.5, scale 5)
                       mesh_pos_scale=(8.0, 0.0, 0.0, 14.0))
    eng = MultiRayCaster(cfg)
    eng.set_mesh(bunny)
    st, cfg = eng.state, eng.config
    cam = cam_lib.orbit_camera(0.3, cfg.aspect_ratio)

    out_g = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg, use_taa=False))(st)

    # the twin WITHOUT its depth weights defines where the filter acts
    orig = composite.cube_cast_soa

    def no_w(*a, **k):
        k["has_depth"] = False
        return orig(*a, **k)

    composite.cube_cast_soa = no_w
    try:
        out_goff = jax.jit(lambda s: frame_lib.render_frame(
            s, cam, cfg, use_taa=False))(st)
    finally:
        composite.cube_cast_soa = orig

    cfg_t = cfg.with_(composite_mode="tile")

    def render_tile(depthw: str):
        tile_composite_pallas.clear_cache()
        os.environ["MV_CKERNEL_DEPTHW"] = depthw
        out = jax.jit(lambda s: frame_lib.render_frame(
            s, cam, cfg_t, use_taa=False))(st)
        return np.asarray(out.image)

    prev = os.environ.get("MV_CKERNEL_DEPTHW")
    try:
        img_w = render_tile("1")
        img_p = render_tile("0")
    finally:
        if prev is None:
            os.environ.pop("MV_CKERNEL_DEPTHW", None)
        else:
            os.environ["MV_CKERNEL_DEPTHW"] = prev
        tile_composite_pallas.clear_cache()

    img_g = np.asarray(out_g.image)
    seam = np.abs(img_g - np.asarray(out_goff.image)).max(-1) > 5e-3
    assert seam.sum() >= 20, f"scene exercises only {seam.sum()} seam px"

    err_w = np.abs(img_g - img_w)[seam].mean()
    err_p = np.abs(img_g - img_p)[seam].mean()
    # measured on this scene: weighted 0.019, plain 0.026 — the bound
    # sits between them, so the plain kernel FAILS it
    assert err_w < 0.85 * err_p, (
        f"depth weights did not improve the seam: {err_w:.4f} vs plain "
        f"{err_p:.4f}")
    assert err_w < 2.2e-2, f"seam mean {err_w:.4f}"
    assert err_p > 2.2e-2, (
        f"plain kernel unexpectedly passes the seam bound ({err_p:.4f})"
        " — tighten it")


def test_warp_composite_mesh_intersection_fidelity():
    """VERDICT item: quantify warp-vs-gather error where the mesh
    intersects volumes (the warp drops CubeCast's per-tap depth weights;
    `PSCube.hlsli:51-108`). Budget: 1e-2 mean over the seam region."""
    import os

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.engine import MultiRayCaster
    from multivolumes_tpu.render import frame as frame_lib

    bunny = "/root/reference/Bin/Assets/bunny.obj"
    if not os.path.exists(bunny):
        return
    cfg = RenderConfig(width=128, height=96, grid_size=16, light_grid_size=8,
                       max_ray_samples=16, max_light_samples=8,
                       num_volumes=2, num_volume_srcs=1,
                       cube_map_size=16, shadow_map_size=64,
                       use_bf16=False, packed_composite=False,
                       composite_mode="gather",
                       # put the mesh inside the volume grid
                       mesh_pos_scale=(0.0, 0.0, 0.0, 4.0))
    eng = MultiRayCaster(cfg)
    eng.set_mesh(bunny)
    st, cfg = eng.state, eng.config
    cam = cam_lib.default_camera(cfg.aspect_ratio)

    out_g = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg, use_taa=False))(st)
    cfg_w = cfg.with_(composite_mode="warp", warp_tile=128)
    out_w = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg_w, use_taa=False))(st)

    img_g = np.asarray(out_g.image)
    img_w = np.asarray(out_w.image)
    diff = np.abs(img_g - img_w)

    # seam region: mesh pixels adjacent to volume contribution
    hdr_g = np.asarray(out_g.hdr)
    mesh_px = hdr_g[..., 3] >= 0.9997      # opaque under volume layers
    vol_px = (hdr_g[..., 3] > 1e-3) & ~mesh_px
    seam = mesh_px & (
        np.roll(vol_px, 1, 0) | np.roll(vol_px, -1, 0)
        | np.roll(vol_px, 1, 1) | np.roll(vol_px, -1, 1))
    assert diff.mean() < 1e-2, f"global mean {diff.mean():.4f}"
    if seam.any():
        seam_err = diff[seam].mean()
        assert seam_err < 3e-2, f"seam mean {seam_err:.4f}"


def test_cube_cast_matches_np_twin():
    """Third-implementation check on the CubeCast filter chain: the
    engine's `composite.cube_cast_soa` (the gather twin that the Pallas
    tile kernel is tested against) must match `np_twin.cube_cast` — an
    independent per-pixel port written literally from `PSCube.hlsli:
    51-108` — on random rays over mixed-LOD volumes, with and without
    the depth-aware weights."""
    import np_twin
    from multivolumes_tpu.config import SharedConsts

    rng = np.random.default_rng(7)
    s, r = 16, 256
    n_eff = rng.choice([4.0, 8.0, 16.0], r).astype(np.float32)
    # one volume slot per ray -> a single batched engine call covers
    # every ray against its own random cube map
    cube_color = rng.uniform(0.0, 1.0, (r, 6, 4, s, s)).astype(np.float32)

    # local-space cube surface positions: a random face axis pinned to
    # +-1, the others uniform — with a bias toward edges/corners so the
    # GetDomain exterior clamp branch fires
    pos = rng.uniform(-1.0, 1.0, (r, 3))
    edge = rng.random(r) < 0.5
    pos[edge] = np.sign(pos[edge]) * (1.0 - rng.uniform(
        0.0, 0.06, (edge.sum(), 3)) / n_eff[edge, None])
    axis = rng.integers(0, 3, r)
    sign = rng.choice([-1.0, 1.0], r)
    pos[np.arange(r), axis] = sign
    d = rng.normal(size=(r, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    # depths clustered so the CubeCast weights land in (0, 1)
    base = rng.uniform(0.3, 0.8, r).astype(np.float32)
    depth_map = np.clip(
        base[:, None, None, None]
        + rng.uniform(-0.05, 0.05, (r, 6, s, s)), 0.0, 1.0
    ).astype(np.float32)

    vol_id = jnp.arange(r, dtype=jnp.int32)
    for has_depth in (True, False):
        got = composite.cube_cast_soa(
            jnp.asarray(cube_color), jnp.asarray(depth_map),
            vol_id, jnp.asarray(n_eff),
            *(jnp.asarray(pos[:, c]) for c in range(3)),
            *(jnp.asarray(d[:, c]) for c in range(3)),
            jnp.asarray(base), has_depth=has_depth)
        have = np.stack([np.asarray(ch) for ch in got], -1)  # (r, 4)
        want = np.stack([
            np_twin.cube_cast(
                cube_color[i], depth_map[i], float(n_eff[i]),
                pos[i], d[i], float(base[i]),
                SharedConsts.Z_NEAR, SharedConsts.Z_FAR,
                has_depth=has_depth)
            for i in range(r)])
        np.testing.assert_allclose(
            have, want, rtol=2e-4, atol=2e-4,
            err_msg=f"has_depth={has_depth}")


def test_tile_swap_fold_bit_equal():
    """The sweep's swap_basis assembly (faces pre-swapped + depth
    pre-unprojected at bucket-assembly time, flags passed through to the
    tile prep) must reproduce the prep-side swap exactly: the same bits
    flow into the kernel either way, only WHERE the transpose/unproject
    happens moves. CPU tolerance covers FMA-contraction drift in the
    fused unproject (the graphs differ in shape); a wrong flag or a
    missed transpose would show as O(0.1) error."""
    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.render import cull as cull_lib
    from multivolumes_tpu.render import sweep as sweep_lib
    from multivolumes_tpu.render import tilecast
    from multivolumes_tpu.scene import state as state_lib

    cfg = RenderConfig(width=128, height=96, grid_size=16,
                       light_grid_size=8,
                       max_ray_samples=24, max_light_samples=8,
                       num_volumes=12, num_volume_srcs=2,
                       cube_map_size=32, shadow_map_size=32,
                       use_bf16=False, packed_composite=False)
    st = state_lib.create_scene(cfg)
    cam = cam_lib.orbit_camera(0.3, cfg.aspect_ratio)
    po = build_per_object(st.volume_worlds, cam.view_proj)
    cull = cull_lib.cull_volumes(
        po, cam.eye, jnp.array([cfg.width, cfg.height], jnp.float32),
        cfg.max_ray_samples, cfg.cube_map_size, cfg.num_cube_mips,
        adaptive=cfg.adaptive_raymarch)
    lod_cull = cull._replace(use_cube_map=cull.visible)
    # synthetic scene depth with a mesh-like block so the CubeCast
    # depth-weight path (with_depth) engages end to end
    depth = jnp.ones((cfg.height, cfg.width), jnp.float32)
    depth = depth.at[28:60, 40:92].set(
        jnp.linspace(0.3, 0.8, 52, dtype=jnp.float32)[None, :])

    def run(swapped: bool):
        a_mat = (warp.screen_basis(cam.screen_to_world, cam.eye)
                 if swapped else None)
        out = sweep_lib.ray_march_view_sweep_lod(
            st.volumes_oriented, st.vol_tex_ids,
            st.light_maps_oriented.astype(jnp.float32), po, lod_cull,
            cam.eye, depth, cfg.cube_map_size, dtype=jnp.float32,
            bucket_caps=cfg.lod_bucket_caps, pack=False,
            light_w=cfg.light_grid_size, vol_zmax=st.vol_zmax,
            sorted_output=True, swap_basis=a_mat)
        if swapped:
            cm, mips, order, swap = out
        else:
            (cm, mips, order), swap = out, None
        cull_c = cull._replace(mip_level=mips, use_cube_map=cull.visible)
        return jnp.stack(tilecast.composite_oit_tile(
            cm, po, cull_c, cam.eye, cam.screen_to_world, depth,
            cfg.width, cfg.height, num_layers=cfg.oit_layers,
            order=order, swap_sorted=swap))

    old = np.asarray(jax.jit(lambda: run(False))())
    new = np.asarray(jax.jit(lambda: run(True))())
    np.testing.assert_allclose(new, old, atol=2e-4, rtol=0)
