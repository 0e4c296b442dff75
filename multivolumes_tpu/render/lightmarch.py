"""Light-space ray marching: per-volume light maps with inter-volume
self-shadowing and SH ambient occlusion.

Port of `CSRayMarchL` (`Content/Shaders/CSRayMarchL.hlsl:20-121`) +
`CastLightRay` (`RayMarch.hlsli:197-230`): one volume's light map is
refreshed per frame (temporal amortization, `CSRayMarchL.hlsl:29-33`); for
every voxel of its light grid, (1) a shadow-map test against the opaque
scene, (2) a directional-light transmittance march through *every* volume
in the scene — inter-volume volumetric shadowing, the N^2 coupling — and
(3) optionally an ambient-occlusion march along the negated density
gradient, attenuating SH irradiance.

TPU formulation: all L^3 voxels batched; the per-volume loop is a
`lax.scan`; each `CastLightRay` is a masked `lax.while_loop` with a global
all-done early-out. The wave-uniform volume id selection from the GPU
append-counter (`g_roVisibleVolumeCount`) becomes a rank-select over the
dense visibility mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multivolumes_tpu.config import SharedConsts
from multivolumes_tpu.core import math3d, sh as sh_lib
from multivolumes_tpu.ops import trilinear
from multivolumes_tpu.ops.trilinear import indexed_trilinear
from multivolumes_tpu.render import raymarch
from multivolumes_tpu.render.cull import CullResult
from multivolumes_tpu.render.perframe import PerObject

ABSORPTION = SharedConsts.ABSORPTION
ZERO_THRESHOLD = SharedConsts.ZERO_THRESHOLD
MAX_DIST = SharedConsts.MAX_DIST


def select_update_volume(visible, frame_idx):
    """`volumeId = visibleVolumes[frameIdx % visibleCount]` with a dense
    mask: pick the (frameIdx mod count)-th visible volume, or frameIdx mod N
    if none are visible (`CSRayMarchL.hlsl:29-33`)."""
    n = visible.shape[0]
    count = jnp.sum(visible.astype(jnp.int32))
    rank = jnp.cumsum(visible.astype(jnp.int32)) - 1
    k = jnp.where(count > 0, frame_idx % jnp.maximum(count, 1), 0)
    candidates = jnp.where(visible & (rank == k), jnp.arange(n), n)
    vid_visible = jnp.min(candidates)
    return jnp.where(count > 0, vid_visible, frame_idx % n).astype(jnp.int32)


def shadow_test(world_pos, shadow_map, shadow_vp, bias: float = 0.0027):
    """PCF shadow compare (`ShadowTest`, `RayMarch.hlsli:103-113`):
    SampleCmpLevelZero with a LESS_EQUAL linear comparison sampler ==
    bilinear blend of the four per-texel (z - bias <= depth) tests."""
    ls = math3d.transform_point(world_pos, shadow_vp)[..., :3]
    uv = ls[..., :2] * 0.5 + 0.5
    uv = uv.at[..., 1].set(1.0 - uv[..., 1])
    z = ls[..., 2] - bias

    smap = shadow_map
    h, w = smap.shape
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx, fy = x - x0f, y - y0f

    def cidx(v, nn):
        return jnp.clip(v.astype(jnp.int32), 0, nn - 1)

    x0, x1 = cidx(x0f, w), cidx(x0f + 1, w)
    y0, y1 = cidx(y0f, h), cidx(y0f + 1, h)

    def cmp(yi, xi):
        return (z <= smap[yi, xi]).astype(jnp.float32)

    c0 = cmp(y0, x0) * (1 - fx) + cmp(y0, x1) * fx
    c1 = cmp(y1, x0) * (1 - fx) + cmp(y1, x1) * fx
    return c0 * (1 - fy) + c1 * fy


def density_gradient(volumes, tex_idx, uvw):
    """Central-difference density gradient (`GetDensityGradient`,
    `RayMarch.hlsli:55-77`): six 1-texel-offset linear taps."""
    d, h, w = volumes.shape[1:4]
    tx = jnp.array([1.0 / w, 0, 0], jnp.float32)
    ty = jnp.array([0, 1.0 / h, 0], jnp.float32)
    tz = jnp.array([0, 0, 1.0 / d], jnp.float32)

    def tap(off):
        return indexed_trilinear(volumes, tex_idx, uvw + off)[..., 3]

    gx = tap(tx) - tap(-tx)
    gy = tap(ty) - tap(-ty)
    gz = tap(tz) - tap(-tz)
    return jnp.stack([gx, gy, gz], -1)


def cast_light_ray(
    volumes, tex_id, origin, ray_dir, transm0, step_scale,
    num_samples: int, active,
):
    """Transmittance march toward the light (`CastLightRay`,
    `RayMarch.hlsli:197-230`). tex_id: (...,) per-ray source id;
    origin/ray_dir: (..., 3); transm0: (...,) initial transmittance."""
    shape = transm0.shape

    def cond(c):
        i, _t, _tr, _pd, done = c
        return (i < num_samples) & ~jnp.all(done)

    def body(c):
        i, t, transm, prev_density, done = c
        pos = origin + ray_dir * t[..., None]
        done = done | jnp.any(jnp.abs(pos) > 1.0, axis=-1)
        uvw = pos * 0.5 + 0.5
        density = indexed_trilinear(volumes, tex_id, uvw)[..., 3]

        d_density = density - prev_density
        opacity = jnp.clip(density * step_scale, 0.0, 1.0)
        new_step = raymarch.get_step(d_density, transm, opacity, step_scale)

        upd = ~done
        transm = jnp.where(upd, transm * (1.0 - density * ABSORPTION), transm)
        prev_density = jnp.where(upd, density, prev_density)
        done = done | (transm < ZERO_THRESHOLD)
        t = jnp.where(done, t, t + new_step)
        return (i + 1, t, transm, prev_density, done)

    init = (
        jnp.asarray(0, jnp.int32),
        jnp.broadcast_to(step_scale, shape).astype(jnp.float32),  # t starts at one step
        transm0,
        jnp.zeros(shape, jnp.float32),
        ~active,
    )
    _i, _t, transm, _pd, _done = jax.lax.while_loop(cond, body, init)
    return transm


def ray_march_light(
    volumes,              # (N_src, D, H, W, 4)
    vol_tex_ids,          # (N,)
    light_maps,           # (N, L, L, L, 3)
    per_object: PerObject,
    cull: CullResult,
    frame_idx,
    shadow_map,           # (Sm, Sm) clip depth of the light's view
    shadow_vp,            # (4, 4)
    light_pos,            # (4,)
    light_color,          # (4,) rgb + intensity
    ambient,              # (4,) rgb + intensity
    sh_coeffs,            # (9, 3)
    max_light_samples: int,
    has_light_probe: bool = True,
) -> jnp.ndarray:
    """Refresh one volume's light map; returns the updated (N, L^3) stack."""
    n = vol_tex_ids.shape[0]
    l = light_maps.shape[1]
    vid = select_update_volume(cull.visible, frame_idx)

    step_scale = MAX_DIST / float(max_light_samples)

    # Voxel centers of the target volume's light grid, in its local space.
    ts = (jnp.arange(l, dtype=jnp.float32) + 0.5) / l * 2.0 - 1.0
    z, y, x = jnp.meshgrid(ts, ts, ts, indexing="ij")
    local = jnp.stack([x, y, z], -1)  # (L,L,L,3) — DTid walks x fastest

    tex_id = vol_tex_ids[vid]
    tex_idx = jnp.broadcast_to(tex_id, (l, l, l)).astype(jnp.int32)
    uvw = local * 0.5 + 0.5
    density = indexed_trilinear(volumes, tex_idx, uvw)[..., 3]
    has_density = density >= ZERO_THRESHOLD

    world = per_object.world[vid]
    world_pos = math3d.transform_point3(local, world)

    shadow = shadow_test(world_pos, shadow_map, shadow_vp)

    # SH ambient: AO ray along the negated density gradient
    # (`CSRayMarchL.hlsl:61-75`).
    if has_light_probe:
        grad = density_gradient(volumes, tex_idx, uvw)
        ao_dir = -grad
        ao_dir = jnp.where(
            jnp.any(jnp.abs(ao_dir) > 0.0, axis=-1, keepdims=True), ao_dir, local
        )
        ao_dir_world = math3d.normalize(
            math3d.transform_vector(ao_dir, world)
        )
        irradiance = sh_lib.eval_irradiance(sh_coeffs, ao_dir_world)
    else:
        ao_dir_world = jnp.zeros_like(world_pos)
        irradiance = jnp.zeros((l, l, l, 3), jnp.float32)

    light_dir_world = light_pos[:3]  # directional (no _POINT_LIGHT_)

    # March through every volume in the scene (`CSRayMarchL.hlsl:77-110`).
    def per_volume(carry, inputs):
        shadow_c, ao_c = carry
        world_i_n, tex_n, is_self = inputs

        origin_n = math3d.transform_point3(world_pos, world_i_n)
        tex_b = jnp.broadcast_to(tex_n, (l, l, l)).astype(jnp.int32)

        # directional-light transmittance
        ldir = math3d.normalize(
            math3d.transform_vector(light_dir_world, world_i_n)
        )
        ldir_b = jnp.broadcast_to(ldir, origin_n.shape)
        o_clip, hit = raymarch.compute_ray_origin(origin_n, ldir_b)
        active = has_density & hit & (shadow_c >= ZERO_THRESHOLD)
        shadow_c = cast_light_ray(
            volumes, tex_b, o_clip, ldir_b, shadow_c, step_scale,
            max_light_samples, active,
        )

        if has_light_probe:
            adir = math3d.normalize(
                math3d.transform_vector(ao_dir_world, world_i_n)
            )
            o2, hit2 = raymarch.compute_ray_origin(origin_n, adir)
            active2 = has_density & hit2
            transm = cast_light_ray(
                volumes, tex_b, o2, adir, jnp.ones((l, l, l), jnp.float32),
                step_scale, max_light_samples, active2,
            )
            transm = jnp.where(active2, transm, 1.0)
            factor = jnp.where(
                is_self,
                transm,
                jnp.power(jnp.clip(transm + 0.5, 0.0, 1.0), 0.25),
            )
            ao_c = ao_c * jnp.where(has_density, factor, 1.0)

        return (shadow_c, ao_c), None

    is_self = jnp.arange(n) == vid
    (shadow, ao), _ = jax.lax.scan(
        per_volume,
        (shadow, jnp.ones((l, l, l), jnp.float32)),
        (per_object.world_i, vol_tex_ids, is_self),
    )

    lcol = light_color[:3] * light_color[3]
    amb = ambient[:3] * ambient[3]
    if has_light_probe:
        # Empty voxels never compute irradiance in the reference
        # (`CSRayMarchL.hlsl:58-75`): their ambient term is zero.
        amb_term = jnp.where(
            has_density[..., None], ao[..., None] * irradiance, 0.0
        )
    else:
        amb_term = jnp.broadcast_to(amb, (l, l, l, 3))

    new_map = shadow[..., None] * lcol + amb_term
    return light_maps.at[vid].set(new_map.astype(light_maps.dtype))
