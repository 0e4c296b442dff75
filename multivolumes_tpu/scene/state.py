"""Scene and frame state as a JAX pytree.

Everything the reference keeps in GPU resources owned by `MultiRayCaster`
(`Content/MultiRayCaster.cpp:99-126,455-549`), `ObjectRenderer` and
`LightProbe` lives here as one dataclass-pytree: density sources, per-volume
transforms, light maps, SH coefficients, radiance environment, mesh
geometry, TAA history, and the frame counter. A frame step is then a pure
function `(SceneState, Camera) -> (image, SceneState)` — XLA dataflow
replaces every barrier/fence/descriptor in the reference, and the state
being a pytree makes checkpoint/resume trivial (the reference has none).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from multivolumes_tpu.config import RenderConfig
from multivolumes_tpu.core import math3d
from multivolumes_tpu.scene import volume as volume_lib


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "frame_idx",
        "volumes",
        "volumes_oriented",
        "vol_zmax",
        "vol_tex_ids",
        "volume_worlds",
        "light_maps",
        "light_maps_oriented",
        "light_sout",
        "sh_coeffs",
        "radiance",
        "light_pos",
        "light_color",
        "ambient",
        "taa_history",
        "mesh_verts",
        "mesh_indices",
        "mesh_world",
        "mesh_prev_wvp",
        "mesh_shadow_map",
        "mesh_shadow_quads",
        "scene_size",
        "rho_light",
        "ao_static",
        "grad_dir",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class SceneState:
    frame_idx: jnp.ndarray        # () int32

    # Volume data — `MultiRayCaster.cpp:99-126`
    volumes: jnp.ndarray          # (N_src, D, H, W, 4) density sources
    volumes_oriented: jnp.ndarray  # (N_src, 3, D, 4, H, W) slab-major
                                  # orientations (static per source; the
                                  # sweep's compute dtype) — precomputed
                                  # here so the per-frame step never pays
                                  # the 6-way transpose of a static stack
    vol_zmax: jnp.ndarray         # (N_src, 3, D) per-slab max density of
                                  # the oriented stacks (static per
                                  # source) — the sweep kernel skips the
                                  # compute of fully-transparent slab
                                  # windows (max <= ZERO_THRESHOLD:
                                  # exact, interpolation is convex)
    vol_tex_ids: jnp.ndarray      # (N,) int32 source id per volume
    volume_worlds: jnp.ndarray    # (N, 4, 4) world transforms (row-vector)
    light_maps: jnp.ndarray       # (N, 3, L, L, L) channel-mid (trailing
                                  # 3 would be tile-padded 32x at rest)
    light_maps_oriented: jnp.ndarray  # (N, 3, L, 3, L, Lp) slab-major,
    #                        minor axis lane-padded (sweep.pad_light_lanes)
                                  # 3-variant orientations in the sweep
                                  # dtype — carried so the per-frame
                                  # orient cost scales with the refreshed
                                  # cohort, not N (the view sweep consumes
                                  # this directly)
    light_sout: jnp.ndarray       # (N, L, L) cached outgoing lateral
                                  # light transmittance per volume
                                  # (position-independent; see
                                  # lightsweep.light_transmittance)

    # Lighting — `LightProbe` + cbPerFrame light params
    sh_coeffs: jnp.ndarray        # (9, 3) SH-projected radiance
    radiance: jnp.ndarray         # (6, R, R, 3) environment cube map
    light_pos: jnp.ndarray        # (4,) xyz + 1
    light_color: jnp.ndarray      # (4,) rgb + intensity
    ambient: jnp.ndarray          # (4,) rgb + intensity

    # TAA ping-pong state — `ObjectRenderer.m_temporalViews`
    taa_history: jnp.ndarray      # (4, H, W) channel-leading color +
                                  # history metadata in channel 3

    # Opaque mesh — `ObjectRenderer` + `XUSG::ObjLoader`
    mesh_verts: jnp.ndarray       # (V, 6) position + normal
    mesh_indices: jnp.ndarray     # (T, 3) int32
    mesh_world: jnp.ndarray       # (4, 4)
    mesh_prev_wvp: jnp.ndarray    # (4, 4) previous frame WVP (velocity)
    mesh_shadow_map: jnp.ndarray  # (Sm, Sm) light-view clip depth, cached:
                                  # mesh + light + mesh_world are static
                                  # between set_mesh/set_light calls, so
                                  # the reference's per-frame RenderShadow
                                  # (`ObjectRenderer.cpp:220-243`)
                                  # rasterizes once here, not per frame
    mesh_shadow_quads: jnp.ndarray  # (4*(Sm/2)^2, 4) quad-packed shadow
                                  # map (mesh.build_shadow_quads) — the
                                  # stride-2 pack costs ~70 ms/Mpx, so it
                                  # is built once per shadow refresh, not
                                  # per frame; one row gather per PCF
    scene_size: jnp.ndarray       # () max mesh extent * scale
                                  # (`ObjectRenderer.cpp:76`; drives the
                                  # shadow ortho size)

    # Static per-source lighting fields (precomputed from the density
    # fields at scene build / volume upload — see lightsweep.precompute_static)
    rho_light: jnp.ndarray        # (N_src, L, L, L)
    ao_static: jnp.ndarray        # (N_src, L, L, L)
    grad_dir: jnp.ndarray         # (N_src, 3, L, L, L)

    @property
    def num_volumes(self) -> int:
        return self.volume_worlds.shape[0]


def volume_grid_worlds(num_volumes: int, size: float, center) -> np.ndarray:
    """Grid layout of volume world matrices.

    Port of `MultiRayCaster::SetVolumesWorld` (`MultiRayCaster.cpp:277-295`):
    a ceil(sqrt(N)) x cols grid in xz spaced 1.5*size, each world =
    scale(size/2) * translate(pos) (`SetVolumeWorld`, `:297-303`).
    """
    if num_volumes < 1:
        raise ValueError("num_volumes must be >= 1")
    center = np.asarray(center, np.float32)
    row_length = int(np.ceil(np.sqrt(float(num_volumes))))
    # true-division ceil so the grid covers every N (the reference's
    # integer-division colLength leaves leftover worlds untouched for
    # non-square N; covering the grid is strictly more useful and renders
    # identically for the demo counts 2/4/16/64)
    col_length = int(np.ceil(num_volumes / row_length))
    worlds = np.zeros((num_volumes, 4, 4), np.float32)
    half = size * 0.5

    pos_z = center[2] - (col_length / 2.0 - 0.5) * size * 1.5
    idx = 0
    for _m in range(col_length):
        pos_x = center[0] - (row_length / 2.0 - 0.5) * size * 1.5
        for _n in range(row_length):
            if idx < num_volumes:
                w = np.eye(4, dtype=np.float32)
                w[0, 0] = w[1, 1] = w[2, 2] = half
                w[3, :3] = (pos_x, center[1], pos_z)
                worlds[idx] = w
            idx += 1
            pos_x += size * 1.5
        pos_z += size * 1.5
    return worlds


def create_scene(config: RenderConfig,
                 mesh_verts=None, mesh_indices=None, scene_size=1.0,
                 radiance=None, dtype=jnp.float32) -> SceneState:
    """Build the initial scene, mirroring `MultiVolumes::LoadAssets`."""
    n = config.num_volumes
    vols = volume_lib.make_volume_sources(config.num_volume_srcs,
                                          config.grid_size, dtype)
    vols_oriented = orient_sources(vols, config)
    vol_tex_ids = jnp.asarray(np.arange(n) % config.num_volume_srcs, jnp.int32)

    cx, cy, cz, size = config.vol_pos_scale
    worlds = jnp.asarray(volume_grid_worlds(n, size, (cx, cy, cz)))

    lgs = config.light_grid_size
    light_maps = jnp.ones((n, 3, lgs, lgs, lgs), dtype)
    light_sout = jnp.ones((n, lgs, lgs), jnp.float32)

    if radiance is None:
        radiance = default_radiance(64)
    from multivolumes_tpu.core import sh as sh_lib
    sh_coeffs = sh_lib.project_cube_map(jnp.asarray(radiance))

    if mesh_verts is None:
        mesh_verts = jnp.zeros((3, 6), jnp.float32)
        mesh_indices = jnp.zeros((1, 3), jnp.int32)
    mx, my, mz, ms = config.mesh_pos_scale
    mesh_world = math3d.scaling(ms) @ math3d.translation(jnp.array([mx, my, mz]))

    from multivolumes_tpu.render import lightsweep
    from multivolumes_tpu.render import mesh as mesh_render

    mesh_quads = jax.jit(mesh_render.build_shadow_quads)(
        jnp.ones((config.shadow_map_size,) * 2, jnp.float32))

    rho_light, ao_static, grad_dir = jax.jit(
        lightsweep.precompute_static, static_argnums=(1, 2)
    )(vols, lgs, config.max_light_samples)

    # Light defaults from `MultiVolumes::OnUpdate` (`MultiVolumes.cpp:340-346`)
    light_pos = jnp.array([75.0, 75.0, -75.0, 1.0], jnp.float32)
    light_color = jnp.array([1.0, 0.7, 0.3, 3.0 * np.pi], jnp.float32)
    ambient = jnp.array([0.4, 0.6, 1.0, 2.0 * np.pi], jnp.float32)

    sweep_dtype = jnp.bfloat16 if config.use_bf16 else jnp.float32
    if config.light_mode == "sweep":
        # initial full light refresh (no mesh shadow yet; engine setters
        # re-refresh) so the per-frame cohort amortization starts from
        # correct maps, and the oriented stacks + outgoing-footprint
        # cache start coherent
        from multivolumes_tpu.render import sweep as sweep_lib
        from multivolumes_tpu.render.perframe import build_per_object

        def _init_light(worlds_, rho_, ao_, gd_, sh_):
            po0 = build_per_object(worlds_, jnp.eye(4, dtype=jnp.float32))
            maps0, sout0 = lightsweep.ray_march_light_sweep_update(
                rho_, ao_, gd_, vol_tex_ids, po0, None, None,
                light_pos, light_color, ambient, sh_,
                config.max_light_samples,
                has_light_probe=config.has_light_probe,
            )
            return (maps0.astype(dtype),
                    sweep_lib.pad_light_lanes(sweep_lib.orient_variants_cf(
                        maps0.astype(sweep_dtype))),
                    sout0)

        light_maps, light_oriented, light_sout = jax.jit(_init_light)(
            worlds, rho_light, ao_static, grad_dir, sh_coeffs)
    else:
        from multivolumes_tpu.render import sweep as sweep_lib

        light_oriented = sweep_lib.pad_light_lanes(jnp.ones(
            (n, 3, lgs, 3, lgs, lgs), sweep_dtype))

    return SceneState(
        frame_idx=jnp.asarray(0, jnp.int32),
        volumes=vols,
        volumes_oriented=vols_oriented,
        vol_zmax=slab_density_max(vols_oriented),
        vol_tex_ids=vol_tex_ids,
        volume_worlds=worlds,
        light_maps=light_maps,
        light_maps_oriented=light_oriented,
        light_sout=light_sout,
        sh_coeffs=sh_coeffs,
        radiance=jnp.asarray(radiance, dtype),
        light_pos=light_pos,
        light_color=light_color,
        ambient=ambient,
        taa_history=jnp.zeros((4, config.height, config.width), jnp.float32),
        mesh_verts=jnp.asarray(mesh_verts, jnp.float32),
        mesh_indices=jnp.asarray(mesh_indices, jnp.int32),
        mesh_world=mesh_world,
        mesh_prev_wvp=jnp.eye(4, dtype=jnp.float32),
        mesh_shadow_map=jnp.ones(
            (config.shadow_map_size,) * 2, jnp.float32),
        mesh_shadow_quads=mesh_quads,
        scene_size=jnp.asarray(scene_size, jnp.float32),
        rho_light=rho_light,
        ao_static=ao_static,
        grad_dir=grad_dir,
    )


def orient_sources(vols, config: RenderConfig):
    """(N_src, D, H, W, 4) -> (N_src, 3, D, 4, H, W) sweep variant stacks in
    the sweep compute dtype. Recompute whenever a source is uploaded."""
    from multivolumes_tpu.render import sweep as sweep_lib

    sweep_dtype = jnp.bfloat16 if config.use_bf16 else jnp.float32
    return jax.jit(
        lambda v: sweep_lib.orient_variants(v.astype(sweep_dtype))
    )(vols)


def slab_density_max(vols_oriented):
    """(N_src, 3, D, 4, H, W) -> (N_src, 3, D) per-slab max density
    (channel 3). Static per source; drives the sweep kernel's
    transparent-block skip."""
    return jax.jit(
        lambda v: jnp.max(v[:, :, :, 3].astype(jnp.float32), axis=(-1, -2))
    )(vols_oriented)


def default_radiance(size: int = 64) -> np.ndarray:
    """Procedural sky radiance cube standing in for `LA_Radiance.dds`
    (stripped from the snapshot): a simple sun + horizon gradient."""
    from multivolumes_tpu.core import sh as sh_lib

    dirs = sh_lib.cube_face_dirs(size)  # (6,S,S,3)
    sun_dir = np.array([0.577, 0.577, -0.577], np.float32)
    cos_sun = np.clip(np.einsum("fuvc,c->fuv", dirs, sun_dir), 0.0, 1.0)
    sun = (cos_sun ** 64)[..., None] * np.array([8.0, 6.0, 4.0], np.float32)
    horiz = np.clip(dirs[..., 1:2] * 0.5 + 0.5, 0.0, 1.0)
    sky = (1.0 - horiz) * np.array([0.25, 0.2, 0.15], np.float32) + horiz * np.array(
        [0.4, 0.6, 1.0], np.float32
    )
    return (sky + sun).astype(np.float32)
