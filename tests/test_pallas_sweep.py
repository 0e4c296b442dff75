"""Pallas sweep kernel vs the XLA einsum-scan twin (render/sweep.py)."""

import jax.numpy as jnp
import numpy as np

from multivolumes_tpu.render import sweep
from multivolumes_tpu.render.sweep import SweepParams, face_ray_params


def _mk_case(n=2, n_src=2, d=12, dl=8, s=8, seed=0):
    rng = np.random.RandomState(seed)
    vols = jnp.asarray(rng.rand(n_src, d, d, d, 4).astype(np.float32))
    lights = jnp.asarray(rng.rand(n, 3, dl, dl, dl).astype(np.float32))
    vol_or = sweep.orient_variants(vols)
    light_or = sweep.orient_variants_cf(lights)
    vol_tex_ids = jnp.asarray(rng.randint(0, n_src, n), jnp.int32)

    # eyes: one outside, one inside the unit box
    eye_local = jnp.asarray(
        np.stack([[0.3, -0.4, -2.5], [0.2, 0.1, 0.3]][:n]), jnp.float32)
    eye_faces = sweep.eye_to_face_frames(eye_local)

    u = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s * 2.0 - 1.0
    v = -u
    params = face_ray_params(eye_faces.reshape(n * 6, 3), u, v, None)
    params = SweepParams(*(x.reshape(n, 6, s, s) for x in params))

    smp = jnp.full((n,), 24.0, jnp.float32)
    run = jnp.ones((n, 6), bool)
    # exercise the face-skip path on one face
    run = run.at[0, 3].set(False)
    return vol_or, light_or, vol_tex_ids, eye_faces, params, smp, run


def test_pallas_sweep_matches_xla():
    (vol_or, light_or, ids, eye_faces, params, smp, run) = _mk_case()
    s = params.s_in.shape[-1]
    want = sweep.sweep_batched(
        vol_or, light_or, ids, eye_faces, params, smp, run, s, s)
    from multivolumes_tpu.ops.pallas.sweep_kernel import sweep_batched_pallas

    got = sweep_batched_pallas(
        vol_or, light_or, ids, eye_faces, params, smp, run, s, s)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-2)


def test_pallas_sweep_full_wrapper():
    """End-to-end through ray_march_view_sweep (impl dispatch)."""
    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.render import cull as cull_lib
    from multivolumes_tpu.render.perframe import build_per_object
    from multivolumes_tpu.scene import state as state_lib

    cfg = RenderConfig(width=160, height=120, grid_size=16,
                       light_grid_size=8, max_ray_samples=32,
                       num_volumes=2, num_volume_srcs=1, cube_map_size=16,
                       use_bf16=False)
    st = state_lib.create_scene(cfg)
    cam = cam_lib.make_camera(jnp.array([2.0, 10.0, -40.0]), jnp.zeros(3),
                              160 / 120)
    po = build_per_object(st.volume_worlds, cam.view_proj)
    cull = cull_lib.cull_volumes(
        po, cam.eye, jnp.array([160.0, 120.0]), cfg.max_ray_samples,
        cfg.cube_map_size, cfg.num_cube_mips)
    cull = cull._replace(use_cube_map=cull.visible)
    lm_or = sweep.orient_variants_cf(st.light_maps)

    out_x = sweep.ray_march_view_sweep(
        st.volumes_oriented, st.vol_tex_ids, lm_or, po, cull, cam.eye,
        None, cfg.cube_map_size, impl="xla")
    out_p = sweep.ray_march_view_sweep(
        st.volumes_oriented, st.vol_tex_ids, lm_or, po, cull, cam.eye,
        None, cfg.cube_map_size, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(out_p.color), np.asarray(out_x.color),
        atol=2e-3, rtol=2e-2)


def test_pallas_sweep_block_skip_is_exact():
    """vol_zmax enables the kernel's transparent-block skip; with a
    volume whose lower-z half is empty, the output must be IDENTICAL to
    the no-skip kernel (interpolation is convex, so a window with
    max density <= ZERO_THRESHOLD can produce no live sample)."""
    rng = np.random.RandomState(3)
    n, n_src, d, dl, s = 2, 2, 12, 8, 8
    dens = rng.rand(n_src, d, d, d).astype(np.float32)
    dens[:, : d // 2] = 0.0          # empty lower-z half
    vols = np.concatenate(
        [rng.rand(n_src, d, d, d, 3).astype(np.float32),
         dens[..., None]], axis=-1)
    vols = jnp.asarray(vols)
    lights = jnp.asarray(rng.rand(n, 3, dl, dl, dl).astype(np.float32))
    vol_or = sweep.orient_variants(vols)
    light_or = sweep.orient_variants_cf(lights)

    from multivolumes_tpu.scene.state import slab_density_max

    zmax = slab_density_max(vol_or)
    ids = jnp.asarray([0, 1], jnp.int32)
    eye_local = jnp.asarray([[0.3, -0.4, -2.5], [0.2, 0.1, 0.3]],
                            jnp.float32)
    eye_faces = sweep.eye_to_face_frames(eye_local)
    u = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s * 2.0 - 1.0
    params = face_ray_params(eye_faces.reshape(n * 6, 3), u, -u, None)
    params = SweepParams(*(x.reshape(n, 6, s, s) for x in params))
    smp = jnp.full((n,), 24.0, jnp.float32)
    run = jnp.ones((n, 6), bool)

    from multivolumes_tpu.ops.pallas.sweep_kernel import sweep_batched_pallas

    base = sweep_batched_pallas(
        vol_or, light_or, ids, eye_faces, params, smp, run, s, s)
    skip = sweep_batched_pallas(
        vol_or, light_or, ids, eye_faces, params, smp, run, s, s,
        vol_zmax=zmax)
    np.testing.assert_array_equal(np.asarray(skip), np.asarray(base))
