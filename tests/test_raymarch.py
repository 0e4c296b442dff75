"""View-space march vs the per-ray numpy twin, and geometry helpers."""

import numpy as np
import jax
import jax.numpy as jnp

import np_twin
from multivolumes_tpu.render import raymarch
from multivolumes_tpu.scene import volume as volume_lib


def test_compute_ray_origin_matches_twin():
    rng = np.random.RandomState(7)
    origins = rng.randn(200, 3).astype(np.float32) * 2.0
    dirs = rng.randn(200, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    got_o, got_hit = jax.jit(raymarch.compute_ray_origin)(
        jnp.asarray(origins), jnp.asarray(dirs)
    )
    got_o, got_hit = np.asarray(got_o), np.asarray(got_hit)

    for i in range(200):
        want_o, want_hit = np_twin.compute_ray_origin(origins[i], dirs[i])
        assert got_hit[i] == want_hit, i
        if want_hit:
            np.testing.assert_allclose(got_o[i], want_o, atol=1e-4)


def test_get_local_pos_covers_cube_faces():
    # center texel of each face must land at the face center
    pos2d = jnp.zeros((6, 2))
    faces = jnp.arange(6)
    p = np.asarray(raymarch.get_local_pos(pos2d, faces))
    expect = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float32,
    )
    np.testing.assert_allclose(p, expect, atol=1e-6)


def test_march_matches_numpy_twin():
    vol = np.asarray(volume_lib.init_grid_data(16))
    light = np.ones(3, np.float32) * 2.0

    rng = np.random.RandomState(3)
    n_rays = 24
    origins = np.zeros((n_rays, 3), np.float32)
    dirs = np.zeros((n_rays, 3), np.float32)
    for i in range(n_rays):
        o = rng.randn(3) * (2.5 if i % 2 else 0.4)  # outside and inside
        d = rng.randn(3)
        d /= np.linalg.norm(d)
        origins[i], dirs[i] = o, d

    o_clip, hit = jax.jit(raymarch.compute_ray_origin)(
        jnp.asarray(origins), jnp.asarray(dirs)
    )
    smp = 32
    t_max = jnp.full((n_rays,), 1e38, jnp.float32)
    smp_count = jnp.full((n_rays,), smp, jnp.int32)
    step_scale = jnp.full((n_rays,), np_twin.MAX_DIST / smp, jnp.float32)

    vol_stack = jnp.asarray(vol)[None]
    lm_stack = jnp.ones((1, 2, 2, 2, 3), jnp.float32) * 2.0
    zeros = jnp.zeros((n_rays,), jnp.int32)

    from multivolumes_tpu.ops.trilinear import indexed_trilinear_soa

    march = jax.jit(lambda o, d, t, s, ss, a: raymarch.march_scatter(
        lambda u, v, w: indexed_trilinear_soa(vol_stack, zeros, u, v, w),
        lambda u, v, w: indexed_trilinear_soa(lm_stack, zeros, u, v, w),
        (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
        t, s, ss, smp, a, adaptive=True,
    ))
    res = march(o_clip, jnp.asarray(dirs), t_max, smp_count, step_scale,
                jnp.asarray(hit))
    got = np.stack([np.asarray(res.r), np.asarray(res.g),
                    np.asarray(res.b), np.asarray(res.a)], -1)
    got[:, :3] /= 2.0 * np.pi

    for i in range(n_rays):
        o_np, hit_np = np_twin.compute_ray_origin(origins[i], dirs[i])
        if not hit_np:
            want = np.zeros(4, np.float32)
        else:
            want = np_twin.march_view_ray(
                vol, lambda p: light, o_np, dirs[i].astype(np.float64),
                1e38, smp,
            )
        np.testing.assert_allclose(got[i], want, atol=2e-3, err_msg=f"ray {i}")


def test_cast_light_ray_matches_twin():
    from multivolumes_tpu.render import lightmarch

    vol = np.asarray(volume_lib.init_grid_data(16))
    rng = np.random.RandomState(11)
    n_rays = 16
    origins = (rng.rand(n_rays, 3).astype(np.float32) * 2 - 1) * 0.95
    dirs = rng.randn(n_rays, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    smp = 24
    step_scale = np_twin.MAX_DIST / smp
    o = jnp.asarray(origins)
    d = jnp.asarray(dirs)
    got = np.asarray(
        jax.jit(lightmarch.cast_light_ray, static_argnums=(6,))(
            jnp.asarray(vol)[None],
            jnp.zeros((n_rays,), jnp.int32),
            (o[:, 0], o[:, 1], o[:, 2]),
            (d[:, 0], d[:, 1], d[:, 2]),
            jnp.ones((n_rays,), jnp.float32),
            jnp.asarray(step_scale, jnp.float32),
            smp,
            jnp.ones((n_rays,), bool),
        )
    )
    for i in range(n_rays):
        want = np_twin.cast_light_ray(
            vol, origins[i].astype(np.float64), dirs[i].astype(np.float64),
            1.0, step_scale, smp,
        )
        np.testing.assert_allclose(got[i], want, atol=2e-3, err_msg=f"ray {i}")


def test_point_light_matches_directional_at_infinity():
    """`_POINT_LIGHT_` (CSRayMarchL.hlsl:87-92): a point light far along
    the light direction converges to the directional march; a nearby one
    diverges from it."""
    import jax.numpy as jnp

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.render import cull as cull_lib, lightmarch
    from multivolumes_tpu.render.perframe import build_per_object
    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.scene import state as state_lib

    cfg = RenderConfig(width=96, height=64, grid_size=16, light_grid_size=8,
                       max_ray_samples=16, max_light_samples=12,
                       num_volumes=2, num_volume_srcs=1, cube_map_size=16,
                       shadow_map_size=32, has_light_probe=False)
    st = state_lib.create_scene(cfg)
    cam = cam_lib.default_camera(cfg.aspect_ratio)
    po = build_per_object(st.volume_worlds, cam.view_proj)
    cull = cull_lib.cull_volumes(
        po, cam.eye, jnp.array([96.0, 64.0]), cfg.max_ray_samples,
        cfg.cube_map_size, cfg.num_cube_mips)

    def run(light_pos, point):
        return np.asarray(lightmarch.ray_march_light(
            st.volumes, st.vol_tex_ids, st.light_maps, po, cull,
            jnp.asarray(0), None, jnp.eye(4), jnp.asarray(light_pos),
            st.light_color, st.ambient, st.sh_coeffs,
            cfg.max_light_samples, has_light_probe=False,
            point_light=point))

    ldir = np.array([0.2, 1.0, -0.5, 0.0], np.float32)
    ldir[:3] /= np.linalg.norm(ldir[:3])
    directional = run(ldir, point=False)
    far_point = run([*(ldir[:3] * 1e6), 1.0], point=True)
    near_point = run([*(ldir[:3] * 12.0), 1.0], point=True)

    np.testing.assert_allclose(far_point, directional, atol=1e-3)
    assert np.abs(near_point - directional).max() > 1e-2


def test_light_march_z_slab_equals_full():
    """ray_march_light(z_slab=...) chunks the light grid's z rows into
    separate dispatches (the demo-scale fidelity warmup's crash guard);
    the chunked result must equal the one-dispatch full-grid march."""
    import jax
    import jax.numpy as jnp

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.render import cull as cull_lib, lightmarch
    from multivolumes_tpu.render.perframe import build_per_object
    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.scene import state as state_lib

    cfg = RenderConfig(width=96, height=64, grid_size=16, light_grid_size=8,
                       max_ray_samples=16, max_light_samples=12,
                       num_volumes=2, num_volume_srcs=1, cube_map_size=16,
                       shadow_map_size=32, has_light_probe=True)
    st = state_lib.create_scene(cfg)
    cam = cam_lib.default_camera(cfg.aspect_ratio)
    po = build_per_object(st.volume_worlds, cam.view_proj)
    cull = cull_lib.cull_volumes(
        po, cam.eye, jnp.array([96.0, 64.0]), cfg.max_ray_samples,
        cfg.cube_map_size, cfg.num_cube_mips)

    def march(lm, z_slab):
        return lightmarch.ray_march_light(
            st.volumes, st.vol_tex_ids, lm, po, cull,
            jnp.asarray(0), None, jnp.eye(4), st.light_pos,
            st.light_color, st.ambient, st.sh_coeffs,
            cfg.max_light_samples, has_light_probe=True, z_slab=z_slab)

    full = np.asarray(jax.jit(lambda lm: march(lm, None))(st.light_maps))
    zc = 4
    slab = jax.jit(lambda lm, z0: march(lm, (z0, zc)))
    out = st.light_maps
    for z0 in range(0, cfg.light_grid_size, zc):
        out = slab(out, jnp.asarray(z0, jnp.int32))
    np.testing.assert_allclose(np.asarray(out), full, atol=2e-6)
