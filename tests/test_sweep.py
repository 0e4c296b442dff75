"""Plane-sweep march vs the reference-semantics gather march."""

import numpy as np
import jax
import jax.numpy as jnp

from multivolumes_tpu.config import RenderConfig
from multivolumes_tpu.core import camera as cam_lib
from multivolumes_tpu.render import cull as cull_lib, raymarch, sweep
from multivolumes_tpu.render.perframe import build_per_object
from multivolumes_tpu.scene import state as state_lib


def test_orient_volumes_roundtrip():
    """Variant stacks + FACE_FLIPS must reproduce the face-frame mapping:
    O_f[iw, iv, iu] == vol(GetLocalPos(face, pu, pv) at pw)."""
    rng = np.random.RandomState(0)
    n = 6
    vol = jnp.asarray(rng.rand(n, n, n, 1).astype(np.float32))
    ov = np.asarray(sweep.orient_variants(vol))  # (3, D, 1, H, W)

    ts = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    for f in range(6):
        var = sweep.FACE_VARIANT[f]
        zf, vf, uf = sweep.FACE_FLIPS[f]
        for _ in range(20):
            iu, iv, iw = rng.randint(0, n, 3)
            pu, pv, pw = ts[iu], ts[iv], ts[iw]
            # face-frame point -> local point (pw toward the face)
            m = {
                0: (pw, pv, -pu), 1: (-pw, pv, pu),
                2: (pu, pw, -pv), 3: (pu, -pw, pv),
                4: (pu, pv, pw), 5: (-pu, pv, -pw),
            }[f]
            x, y, z = m
            xi = int(round((x * 0.5 + 0.5) * n - 0.5))
            yi = int(round((y * 0.5 + 0.5) * n - 0.5))
            zi = int(round((z * 0.5 + 0.5) * n - 0.5))
            want = float(np.asarray(vol)[zi, yi, xi, 0])
            ju = (n - 1 - iu) if uf else iu
            jv = (n - 1 - iv) if vf else iv
            jw = (n - 1 - iw) if zf else iw
            got = float(ov[var, jw, 0, jv, ju])
            assert abs(got - want) < 1e-6, (f, iu, iv, iw)


def test_sweep_matches_reference_march():
    cfg = RenderConfig(width=160, height=120, grid_size=16,
                       light_grid_size=8, max_ray_samples=32,
                       num_volumes=1, num_volume_srcs=1, cube_map_size=16)
    st = state_lib.create_scene(cfg)
    cam = cam_lib.make_camera(jnp.array([2.0, 10.0, -40.0]), jnp.zeros(3),
                              160 / 120)
    po = build_per_object(st.volume_worlds, cam.view_proj)
    cull = cull_lib.cull_volumes(po, cam.eye, jnp.array([160.0, 120.0]),
                                 32, 16, 5, adaptive=False)
    depth = jnp.ones((120, 160), jnp.float32)

    lm_last = jnp.moveaxis(st.light_maps, 1, -1)  # channel-last for golden
    ref = jax.jit(
        lambda: raymarch.ray_march_view(
            st.volumes, st.vol_tex_ids, lm_last, po, cull, cam.eye,
            depth, 16, 32, adaptive=False,
        )
    )()
    vol_or = sweep.orient_variants(st.volumes)
    lm_or = sweep.orient_variants_cf(st.light_maps)
    sw = jax.jit(
        lambda: sweep.ray_march_view_sweep(
            vol_or, st.vol_tex_ids, lm_or, po, cull, cam.eye, depth, 16,
            num_planes=32,
        )
    )()
    r, s = np.asarray(ref.color), np.asarray(sw.color)  # (N,6,4,S,S)
    mask = r[:, :, 3] > 0.02
    assert mask.any()
    diff = np.abs(r - s)
    assert diff.mean() < 2e-3
    assert np.percentile(np.max(diff, axis=2)[mask], 99) < 0.05

    # analytic spot check: a face-center ray through the blob center must
    # accumulate nearly full opacity in both
    assert r[0, 4, 3, 8, 8] > 0.9 and s[0, 4, 3, 8, 8] > 0.9


def test_lod_bucketed_sweep():
    """Buckets assign sorted-by-mip volumes; maps land in mip corners."""
    cfg = RenderConfig(width=160, height=120, grid_size=16,
                       light_grid_size=8, max_ray_samples=32,
                       num_volumes=4, num_volume_srcs=2, cube_map_size=16)
    st = state_lib.create_scene(cfg)
    # two volumes near (big on screen), two far (small)
    worlds = np.array(st.volume_worlds)
    worlds[2, 3, 2] += 400.0
    worlds[3, 3, 2] += 400.0
    st = __import__("dataclasses").replace(
        st, volume_worlds=jnp.asarray(worlds))
    cam = cam_lib.make_camera(jnp.array([2.0, 10.0, -40.0]), jnp.zeros(3),
                              160 / 120)
    po = build_per_object(st.volume_worlds, cam.view_proj)
    cull = cull_lib.cull_volumes(po, cam.eye, jnp.array([160.0, 120.0]),
                                 32, 16, 5)
    cull = cull._replace(use_cube_map=cull.visible)

    vol_or = sweep.orient_variants(st.volumes)
    lm_or = sweep.orient_variants_cf(st.light_maps)
    cm, mips = jax.jit(
        lambda: sweep.ray_march_view_sweep_lod(
            vol_or, st.vol_tex_ids, lm_or, po, cull, cam.eye, None, 16,
            bucket_caps=(2, 2, 99),
        )
    )()
    mips = np.asarray(mips)
    cull_mips = np.asarray(cull.mip_level)
    # near volumes (smaller projected mip) got the full-res bucket
    near = np.argsort(np.where(np.asarray(cull.visible), cull_mips, 99))[:2]
    assert set(np.where(mips == 0)[0]) == set(near.tolist())
    # bucket-1 volumes store content only in the 8x8 corner
    col = np.asarray(cm.color)
    for vid in range(4):
        if mips[vid] == 1 and bool(cull.visible[vid]):
            assert np.abs(col[vid, :, :, 8:, :]).max() == 0.0
            assert np.abs(col[vid, :, :, :, 8:]).max() == 0.0


def test_adaptive_effective_resolution_routes_small_volumes():
    """EP/adaptive routing (VERDICT #6): a far, small-footprint volume
    must march at its estimated mip (map packed into the n_eff^2 corner,
    the rest of its bucket slot untouched = work saved), and the
    composited image must stay within tolerance of marching it at full
    resolution — cube texel density ~ screen density is the paper's
    sufficiency claim (`EstimateCubeMapLOD`, VolumeCull.hlsli:267-294)."""
    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.render import cull as cull_lib
    from multivolumes_tpu.render import frame as frame_lib
    from multivolumes_tpu.render.perframe import build_per_object

    cfg = RenderConfig(width=160, height=120, grid_size=16,
                       light_grid_size=8, max_ray_samples=64,
                       num_volumes=2, num_volume_srcs=1, cube_map_size=32,
                       shadow_map_size=32, use_bf16=False)
    st = state_lib.create_scene(cfg)
    # volume 1 pushed far away: small projected footprint
    worlds = np.array(st.volume_worlds)
    worlds[1, 3, 2] += 400.0
    import dataclasses
    st = dataclasses.replace(st, volume_worlds=jnp.asarray(worlds))

    cam = cam_lib.make_camera(jnp.array([0.0, 2.0, -40.0]), jnp.zeros(3),
                              160 / 120)
    po = build_per_object(st.volume_worlds, cam.view_proj)
    cull = cull_lib.cull_volumes(
        po, cam.eye, jnp.array([160.0, 120.0]), cfg.max_ray_samples,
        cfg.cube_map_size, cfg.num_cube_mips, adaptive=True)
    mips = np.asarray(cull.mip_level)
    assert bool(cull.visible[1]) and mips[1] >= 1, mips

    lm_or = sweep.orient_variants_cf(st.light_maps)
    lod_cull = cull._replace(use_cube_map=cull.visible)
    maps_a, eff_mips = sweep.ray_march_view_sweep_lod(
        st.volumes_oriented, st.vol_tex_ids, lm_or, po, lod_cull,
        cam.eye, None, cfg.cube_map_size, bucket_caps=(2, 1 << 30),
        pack=False)
    # the far volume marched at its estimated mip...
    assert int(eff_mips[1]) >= 1
    n_eff = cfg.cube_map_size >> int(eff_mips[1])
    col = np.asarray(maps_a.color[1], np.float32)     # (6, 4, S, S)
    assert np.abs(col[:, :, n_eff:, :]).max() == 0.0  # corner-packed
    assert np.abs(col[:, :, :, n_eff:]).max() == 0.0
    assert np.abs(col[:, :, :n_eff, :n_eff]).sum() > 0.0

    # ...and the rendered image matches the full-resolution march
    out_a = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg, use_taa=False))(st)
    cfg_full = cfg.with_(adaptive_raymarch=False, lod_bucket_caps=None)
    out_f = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg_full, use_taa=False))(st)
    diff = np.abs(np.asarray(out_a.image) - np.asarray(out_f.image))
    assert diff.mean() < 2e-3, diff.mean()


def test_far_zoom_march_cost_tracks_coverage():
    """VERDICT round-2 missing item 5: with 64 sub-8-px volumes the
    march budget must collapse to the deepest-LOD floor, bounding the
    tiny-volume overshoot. The reference switches such volumes to
    per-pixel marching when coverage < cube texels
    (`CSVolumeCull.hlsl:64-71`); the TPU realization marches them one
    mip deeper with an 8-texel-per-face floor — this pins the bound:
    total marched texels == N * 6 * 8^2 (64x below full resolution),
    a ~16x overshoot of the raw pixel coverage that static shapes pay
    for zero gather traffic."""
    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.render import cull as cull_lib
    from multivolumes_tpu.render.perframe import build_per_object

    cfg = RenderConfig(width=320, height=200, grid_size=16,
                       light_grid_size=8, max_ray_samples=64,
                       num_volumes=64, num_volume_srcs=2,
                       cube_map_size=64, shadow_map_size=32,
                       use_bf16=False)
    st = state_lib.create_scene(cfg)
    # far zoom: the whole 8x8 volume grid covers a small screen patch
    cam = cam_lib.make_camera(jnp.array([0.0, 60.0, -700.0]),
                              jnp.zeros(3), cfg.aspect_ratio)
    po = build_per_object(st.volume_worlds, cam.view_proj)
    cull = cull_lib.cull_volumes(
        po, cam.eye, jnp.array([320.0, 200.0]), cfg.max_ray_samples,
        cfg.cube_map_size, cfg.num_cube_mips, adaptive=True)
    edge = np.asarray(cull.max_edge_px)
    vis = np.asarray(cull.visible)
    assert vis.any()
    assert edge[vis].max() < 8.0, edge[vis].max()  # genuinely tiny

    order, buckets = sweep.lod_partition(
        cull, cfg.num_volumes, cfg.cube_map_size, cfg.lod_bucket_caps)
    max_mip = (cfg.cube_map_size // 8).bit_length() - 1
    marched = 0
    for (b0, count, size_b, mip_b) in buckets:
        ids = np.asarray(order)[b0:b0 + count]
        actual = np.clip(np.asarray(cull.mip_level)[ids], 0, max_mip)
        scheme_off = ~np.asarray(cull.use_cube_map)[ids]
        eff = np.clip(np.maximum(actual + scheme_off, mip_b),
                      mip_b, max_mip)
        n_eff = cfg.cube_map_size >> eff
        marched += int((6 * n_eff * n_eff * vis[ids]).sum())

    floor = int(vis.sum()) * 6 * 8 * 8
    full = int(vis.sum()) * 6 * cfg.cube_map_size ** 2
    assert marched == floor, (marched, floor)
    assert marched * 32 <= full  # >= 32x below full-resolution marching


def test_coarse_occlusion_bound_is_conservative():
    """Buckets >= 32 sample occlusion at half resolution with a 3x3
    max-dilate before upsampling; the resulting per-ray s_max must never
    be tighter than the exact full-resolution tap (over-marching is
    clipped by the composite's depth test; under-marching loses volume)."""
    cfg = RenderConfig(width=160, height=120, grid_size=16,
                       light_grid_size=8, max_ray_samples=32,
                       num_volumes=4, num_volume_srcs=1, cube_map_size=32)
    st = state_lib.create_scene(cfg)
    cam = cam_lib.make_camera(jnp.array([2.0, 10.0, -40.0]), jnp.zeros(3),
                              160 / 120)
    po = build_per_object(st.volume_worlds, cam.view_proj)

    # a mesh-like occluder: a depth step across the middle of the screen
    yy = jnp.arange(120, dtype=jnp.float32)[:, None]
    depth = jnp.where(jnp.broadcast_to(yy, (120, 160)) > 60, 0.55, 1.0)

    eye_local = sweep.math3d.transform_point3(cam.eye, po.world_i)
    eye_faces = sweep.eye_to_face_frames(eye_local)
    n_eff = jnp.full((4,), 32.0, jnp.float32)

    fine, _ = jax.jit(lambda: sweep._occlusion_s_max(
        po, eye_local, eye_faces, depth, 32, n_eff=n_eff))()
    coarse, _ = jax.jit(lambda: sweep._occlusion_s_max(
        po, eye_local, eye_faces, depth, 16, n_eff=n_eff * 0.5))()
    bound = jax.jit(lambda c: sweep._upsample2_nearest(
        sweep._dilate3_max(c), 32))(coarse)

    f = np.asarray(fine)
    b = np.asarray(bound)
    finite = np.isfinite(f) & (f < 1e30)
    assert finite.any()
    # conservative everywhere the exact bound is a real occlusion clamp:
    # the 3x3 dilate brackets the fine samples spatially; smooth-field
    # curvature between coarse centres can undershoot by O(1e-4) in s,
    # a few percent of ONE march plane (spacing ~1/128) — allow a
    # quarter-plane slack, forbid anything that would skip a plane
    assert (b[finite] >= f[finite] - 2e-3).all(), (
        float((b[finite] - f[finite]).min()))
    # and the step actually occludes some rays (the test bites)
    assert (f[finite] < 10.0).any()


def test_quarter_occlusion_bound_is_conservative():
    """Buckets >= 64 sample occlusion at QUARTER resolution from a 4x4
    max-pooled depth source (sweep.py `size_b >= 64` branch). The
    production math exactly: pooled source + 3x3 coarse dilate + two
    nearest upsamples must never tighten the bound vs the exact
    full-resolution tap of the half-pooled source the >=32 path uses."""
    cfg = RenderConfig(width=160, height=120, grid_size=16,
                       light_grid_size=8, max_ray_samples=32,
                       num_volumes=4, num_volume_srcs=1, cube_map_size=64)
    st = state_lib.create_scene(cfg)
    cam = cam_lib.make_camera(jnp.array([2.0, 10.0, -40.0]), jnp.zeros(3),
                              160 / 120)
    po = build_per_object(st.volume_worlds, cam.view_proj)

    yy = jnp.arange(120, dtype=jnp.float32)[:, None]
    depth = jnp.where(jnp.broadcast_to(yy, (120, 160)) > 60, 0.55, 1.0)

    eye_local = sweep.math3d.transform_point3(cam.eye, po.world_i)
    eye_faces = sweep.eye_to_face_frames(eye_local)
    n_eff = jnp.full((4,), 64.0, jnp.float32)

    occl2 = jax.jit(sweep._pool2_max)(depth)          # the >=32 source
    occl4 = jax.jit(sweep._pool2_max)(occl2)          # the >=64 source
    fine, _ = jax.jit(lambda: sweep._occlusion_s_max(
        po, eye_local, eye_faces, occl2, 64, n_eff=n_eff))()
    coarse, _ = jax.jit(lambda: sweep._occlusion_s_max(
        po, eye_local, eye_faces, occl4, 16, n_eff=n_eff * 0.25))()
    bound = jax.jit(lambda c: sweep._upsample2_nearest(
        sweep._upsample2_nearest(sweep._dilate3_max(c), 32), 64))(coarse)

    f = np.asarray(fine)
    b = np.asarray(bound)
    finite = np.isfinite(f) & (f < 1e30)
    assert finite.any()
    assert (b[finite] >= f[finite] - 2e-3).all(), (
        float((b[finite] - f[finite]).min()))
    assert (f[finite] < 10.0).any()
