"""View-space ray marching in cube-map space — the engine's core.

Port of `CSRayMarchV` (`Content/Shaders/CSRayMarch.hlsl:77-158`) and the
shared marching math of `RayMarch.hlsli`: for every interior-face texel of
every visible volume's cube map, march the ray from the (local-space) eye
through the texel, front-to-back compositing trilinear density samples
modulated by the volume's light map, with empty-space skipping, adaptive
step size (`GetStep`, `RayMarch.hlsli:182-192`), transmittance early-out,
and scene-depth occlusion (`GetTMax`).

This module is the *reference-faithful* formulation: a `lax.while_loop`
over sample steps carrying (t, scatter, prev_density, done) for all rays of
all volumes at once, with gather-based trilinear sampling. It defines the
semantics the Pallas plane-sweep kernels (`multivolumes_tpu.ops.pallas`)
must reproduce, and doubles as the CPU/interpret-mode twin (the rebuild's
analog of the reference's WARP software-device path).

GPU-driven dispatch in the reference (`ExecuteIndirect` over the compacted
visible list / D3D12 work graphs, `MultiRayCaster.cpp:1329-1438`) becomes
dense predication: all N volumes x 6 faces x S^2 texels are computed with
per-ray validity masks; masked rays are `done` from step 0 so the global
while-loop early-out still ends the work when every live ray terminates.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Callable

import jax
import jax.numpy as jnp

from multivolumes_tpu.config import SharedConsts
from multivolumes_tpu.core import math3d
from multivolumes_tpu.ops import trilinear
from multivolumes_tpu.ops.trilinear import indexed_trilinear
from multivolumes_tpu.render.cull import CullResult
from multivolumes_tpu.render.perframe import PerObject

ABSORPTION = SharedConsts.ABSORPTION
ZERO_THRESHOLD = SharedConsts.ZERO_THRESHOLD
MAX_DIST = SharedConsts.MAX_DIST


def get_local_pos(pos2d, face):
    """Interior-face texel -> local-space position on the unit cube.

    Port of `GetLocalPos` (`CSRayMarch.hlsl:28-53`). pos2d: (..., 2) texel
    coords already normalized to [-1, 1] with y flipped; face: (...,) int.
    """
    px, py = pos2d[..., 0], pos2d[..., 1]
    one = jnp.ones_like(px)
    candidates = jnp.stack(
        [
            jnp.stack([one, py, -px], -1),     # +X
            jnp.stack([-one, py, px], -1),     # -X
            jnp.stack([px, one, -py], -1),     # +Y
            jnp.stack([px, -one, py], -1),     # -Y
            jnp.stack([px, py, one], -1),      # +Z
            jnp.stack([-px, py, -one], -1),    # -Z
        ],
        axis=0,
    )
    return jnp.take_along_axis(
        candidates, face[None, ..., None].astype(jnp.int32), axis=0
    )[0]


def compute_ray_origin(ray_origin, ray_dir, eps: float = 1e-12):
    """Clip the ray start to the unit box (`ComputeRayOrigin`,
    `RayMarch.hlsli:128-155`). Returns (new_origin, is_hit)."""
    inside = jnp.all(jnp.abs(ray_origin) <= 1.0, axis=-1)

    safe_dir = jnp.where(jnp.abs(ray_dir) > eps, ray_dir, jnp.where(ray_dir >= 0, eps, -eps))
    u = (-jnp.sign(safe_dir) - ray_origin) / safe_dir  # (..., 3)

    # For each slab axis i, the hit point's other two coords must be in-box.
    p = ray_origin[..., None, :] + ray_dir[..., None, :] * u[..., :, None]  # (...,3,3)
    in_box = jnp.abs(p) <= 1.0 + 1e-6
    axis_ok = jnp.ones(u.shape, bool)
    # exclude the slab axis itself from the check (it is exactly +-1)
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3
        axis_ok = axis_ok.at[..., i].set(in_box[..., i, j] & in_box[..., i, k])
    valid = (u >= 0.0) & axis_ok & (jnp.abs(ray_dir) > eps)

    big = jnp.asarray(3.402823466e38, ray_origin.dtype)
    uu = jnp.where(valid, u, big)
    U = jnp.min(uu, axis=-1)
    is_hit = jnp.any(valid, axis=-1)

    clipped = jnp.clip(ray_origin + ray_dir * U[..., None], -1.0, 1.0)
    new_origin = jnp.where(inside[..., None], ray_origin, clipped)
    return new_origin, inside | is_hit


def compute_target_hit(ray_origin, target, ray_dir, eps: float = 1e-12):
    """Ray parameter at which the ray reaches the target texel
    (`ComputeTargetHit`, `RayMarch.hlsli:160-165`)."""
    safe_dir = jnp.where(jnp.abs(ray_dir) > eps, ray_dir, jnp.where(ray_dir >= 0, eps, -eps))
    u = (target - ray_origin) / safe_dir
    return jnp.max(u, axis=-1)


def get_t_max(clip_pos, ray_origin, ray_dir, world_view_proj_i, eps: float = 1e-12):
    """Occluded end point from a scene-depth sample (`GetTMax`,
    `RayMarch.hlsli:82-97`). clip_pos: (..., 3) ndc xy + depth z."""
    h = math3d.transform_point(clip_pos, world_view_proj_i)
    pos = h[..., :3] / h[..., 3:4]
    safe_dir = jnp.where(jnp.abs(ray_dir) > eps, ray_dir, jnp.where(ray_dir >= 0, eps, -eps))
    t = (pos - ray_origin) / safe_dir
    t_occ = jnp.max(t, axis=-1)
    return jnp.where(clip_pos[..., 2] >= 1.0, jnp.asarray(3.402823466e38, t_occ.dtype), t_occ)


def get_step(d_density, transm, density, step_scale):
    """Adaptive step size (`GetStep`, `RayMarch.hlsli:182-192`)."""
    factor_ev = jnp.minimum(1.0 / 256.0 / jnp.maximum(jnp.abs(d_density), 1e-20), 2.0)
    factor_ui = jnp.minimum(1.0 - density, 1.0)
    factor_th = 1.0 - transm
    return step_scale * jnp.maximum(1.5 * factor_ev * factor_ui * factor_th, 1.0)


class MarchResult(NamedTuple):
    scatter: jnp.ndarray  # (..., 4) premultiplied scatter + inv transmittance
    steps: jnp.ndarray    # () int32 — global step count actually executed


def march_scatter(
    sample_fn: Callable,
    light_fn: Callable,
    ray_origin,            # (..., 3) already clipped to the box
    ray_dir,               # (..., 3)
    t_max,                 # (...,)
    smp_count,             # (...,) int32 per-ray sample budget
    step_scale,            # (...,) base step length
    max_steps: int,
    active,                # (...,) bool — rays to march at all
    adaptive: bool = True,
) -> MarchResult:
    """Front-to-back scatter accumulation — the inner loop of
    `CSRayMarch.hlsl:112-155` with break -> done-mask semantics and a global
    all-done early-out (`lax.while_loop`)."""
    shape = t_max.shape
    f32 = ray_origin.dtype

    def cond(carry):
        i, _t, _sc, _pd, done = carry
        return (i < max_steps) & ~jnp.all(done)

    def body(carry):
        i, t, scatter, prev_density, done = carry
        pos = ray_origin + ray_dir * t[..., None]
        out_of_box = jnp.any(jnp.abs(pos) > 1.0, axis=-1)
        done = done | out_of_box | (i >= smp_count)

        uvw = pos * 0.5 + 0.5
        color = sample_fn(uvw)
        density = color[..., 3]
        occupied = density > ZERO_THRESHOLD

        transm = 1.0 - scatter[..., 3]
        light = light_fn(uvw)

        d_density = density - prev_density
        if adaptive:
            new_step = jnp.where(
                occupied,
                get_step(d_density, transm, density, step_scale),
                step_scale,
            )
        else:
            new_step = jnp.broadcast_to(step_scale, shape).astype(f32)

        rgb = color[..., :3] * density[..., None] * light
        contrib = (
            jnp.concatenate([rgb, density[..., None]], -1)
            * (ABSORPTION * transm)[..., None]
        )
        do_acc = occupied & ~done
        scatter = scatter + jnp.where(do_acc[..., None], contrib, 0.0)
        prev_density = jnp.where(do_acc, density, prev_density)
        done = done | (occupied & (transm < ZERO_THRESHOLD))

        t = jnp.where(done, t, t + new_step)
        done = done | (t > t_max)
        return (i + 1, t, scatter, prev_density, done)

    init = (
        jnp.asarray(0, jnp.int32),
        jnp.zeros(shape, f32),
        jnp.zeros(shape + (4,), f32),
        jnp.zeros(shape, f32),
        ~active,
    )
    i, _t, scatter, _pd, _done = jax.lax.while_loop(cond, body, init)
    return MarchResult(scatter=scatter, steps=i)


class CubeMaps(NamedTuple):
    color: jnp.ndarray  # (N, 6, S, S, 4)
    depth: jnp.ndarray  # (N, 6, S, S) clip-space z of the scene behind


def ray_march_view(
    volumes,              # (N_src, D, H, W, 4)
    vol_tex_ids,          # (N,) int32
    light_maps,           # (N, L, L, L, 3)
    per_object: PerObject,
    cull: CullResult,
    eye,                  # (3,)
    depth_map,            # (Hd, Wd) scene depth or None
    cube_map_size: int,
    max_steps: int,
    adaptive: bool = True,
) -> CubeMaps:
    """March every visible volume's cube map. Returns color + depth maps.

    Dense equivalent of the `rayMarchV` ExecuteIndirect pass
    (`MultiRayCaster.cpp:1329-1368`): volume/face/texel predication stands
    in for the compacted dispatch. Per-volume LOD marches the texel grid at
    the mip resolution S >> mip, stored in the top-left corner of the
    full-resolution buffer (consumers rescale UVs by S_mip/S).
    """
    n = vol_tex_ids.shape[0]
    s = cube_map_size

    eye_local = math3d.transform_point3(eye, per_object.world_i)  # (N,3)

    mip = cull.mip_level  # (N,)
    s_mip = (s >> jnp.minimum(mip, 31)).astype(jnp.float32)  # (N,)

    ij = jnp.arange(s, dtype=jnp.float32)
    jj, ii = jnp.meshgrid(ij, ij, indexing="ij")  # (S,S): jj = y/row, ii = x/col

    # Texel -> [-1,1] at the mip resolution; y flipped (`CSRayMarch.hlsl:33-34`)
    px = (ii[None] + 0.5) / s_mip[:, None, None] * 2.0 - 1.0  # (N,S,S)
    py = -((jj[None] + 0.5) / s_mip[:, None, None] * 2.0 - 1.0)
    texel_valid = (ii[None] < s_mip[:, None, None]) & (jj[None] < s_mip[:, None, None])

    pos2d = jnp.stack([px, py], -1)  # (N,S,S,2)
    faces = jnp.arange(6, dtype=jnp.int32)
    target = jax.vmap(
        lambda f: get_local_pos(pos2d, jnp.broadcast_to(f, pos2d.shape[:-1])),
        out_axes=1,
    )(faces)  # (N,6,S,S,3)

    origin0 = jnp.broadcast_to(eye_local[:, None, None, None, :], target.shape)
    ray_dir = math3d.normalize(target - origin0)
    origin, is_hit = compute_ray_origin(origin0, ray_dir)

    t_max = compute_target_hit(origin, target, ray_dir)

    face_ok = cull.face_mask[:, :, None, None]  # (N,6,1,1)
    active = (
        is_hit
        & face_ok
        & texel_valid[:, None]
        & cull.visible[:, None, None, None]
        & cull.use_cube_map[:, None, None, None]
    )

    # Scene-depth occlusion (`GetClipPos` + `GetTMax`,
    # `CSRayMarch.hlsl:102-107`): project a point slightly inside the
    # volume, read scene depth (point sampler), clamp the march.
    if depth_map is not None:
        probe = origin + 0.01 * ray_dir
        h = math3d.transform_point(
            probe, per_object.world_view_proj[:, None, None, None]
        )
        xy = h[..., :2] / h[..., 3:4]
        uv = xy * 0.5 + 0.5
        uv = uv.at[..., 1].set(1.0 - uv[..., 1])
        z = trilinear.sample_point(depth_map, uv)
        clip_pos = jnp.concatenate([xy, z[..., None]], -1)
        cube_depth = z
        t_max = jnp.minimum(
            t_max,
            get_t_max(clip_pos, origin, ray_dir,
                      per_object.world_view_proj_i[:, None, None, None]),
        )
    else:
        cube_depth = jnp.ones(target.shape[:-1], jnp.float32)

    smp_count = jnp.broadcast_to(
        cull.smp_count[:, None, None, None], active.shape
    )
    step_scale = MAX_DIST / jnp.maximum(smp_count.astype(jnp.float32), 1.0)

    # Pointwise gathers with the texture id as an index coordinate — never
    # materializes a per-volume copy of the source stack.
    tex_idx = jnp.broadcast_to(
        vol_tex_ids[:, None, None, None], active.shape
    ).astype(jnp.int32)
    lm_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None, None, None], active.shape
    )

    def sample_fn(uvw):
        return indexed_trilinear(volumes, tex_idx, uvw)

    def light_fn(uvw):
        return indexed_trilinear(light_maps, lm_idx, uvw)

    result = march_scatter(
        sample_fn, light_fn, origin, ray_dir, t_max,
        smp_count, step_scale, max_steps, active, adaptive,
    )
    scatter = result.scatter
    scatter = scatter.at[..., :3].mul(1.0 / (2.0 * math.pi))
    scatter = jnp.where(active[..., None], scatter, 0.0)

    return CubeMaps(color=scatter, depth=cube_depth)
