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

TPU formulation: all L^3 voxels batched as scalar fields (SoA — see
render/raymarch.py docstring for the layout rule); the per-volume loop is
a `lax.scan`; each `CastLightRay` is a masked `lax.while_loop` with a
global all-done early-out. The wave-uniform volume id selection from the
GPU append-counter (`g_roVisibleVolumeCount`) becomes a rank-select over
the dense visibility mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multivolumes_tpu.config import SharedConsts
from multivolumes_tpu.core import sh as sh_lib
from multivolumes_tpu.ops.trilinear import indexed_trilinear_soa
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


def shadow_test_soa(wx, wy, wz, shadow_map, shadow_vp, bias: float = 0.0027):
    """PCF shadow compare (`ShadowTest`, `RayMarch.hlsli:103-113`):
    SampleCmpLevelZero with a LESS_EQUAL linear comparison sampler ==
    bilinear blend of the four per-texel (z - bias <= depth) tests."""
    m = shadow_vp
    lx = wx * m[0, 0] + wy * m[1, 0] + wz * m[2, 0] + m[3, 0]
    ly = wx * m[0, 1] + wy * m[1, 1] + wz * m[2, 1] + m[3, 1]
    lz = wx * m[0, 2] + wy * m[1, 2] + wz * m[2, 2] + m[3, 2]

    u = lx * 0.5 + 0.5
    v = 1.0 - (ly * 0.5 + 0.5)
    z = lz - bias

    h, w = shadow_map.shape
    x = u * w - 0.5
    y = v * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx, fy = x - x0f, y - y0f

    def cidx(vv, nn):
        return jnp.clip(vv.astype(jnp.int32), 0, nn - 1)

    x0, x1 = cidx(x0f, w), cidx(x0f + 1, w)
    y0, y1 = cidx(y0f, h), cidx(y0f + 1, h)

    def cmp(yi, xi):
        return (z <= shadow_map[yi, xi]).astype(jnp.float32)

    c0 = cmp(y0, x0) * (1 - fx) + cmp(y0, x1) * fx
    c1 = cmp(y1, x0) * (1 - fx) + cmp(y1, x1) * fx
    return c0 * (1 - fy) + c1 * fy


def density_gradient_soa(volumes, tex_idx, u, v, w):
    """Central-difference density gradient (`GetDensityGradient`,
    `RayMarch.hlsli:55-77`): six 1-texel-offset linear taps -> (gx, gy, gz)."""
    d, h, ww = volumes.shape[1:4]

    def dens(du, dv, dw):
        return indexed_trilinear_soa(volumes, tex_idx, u + du, v + dv, w + dw)[3]

    gx = dens(1.0 / ww, 0, 0) - dens(-1.0 / ww, 0, 0)
    gy = dens(0, 1.0 / h, 0) - dens(0, -1.0 / h, 0)
    gz = dens(0, 0, 1.0 / d) - dens(0, 0, -1.0 / d)
    return gx, gy, gz


def cast_light_ray(
    volumes, tex_id, origin, ray_dir, transm0, step_scale,
    num_samples: int, active,
):
    """Transmittance march toward the light (`CastLightRay`,
    `RayMarch.hlsli:197-230`). origin/ray_dir are (x, y, z) scalar-field
    tuples; transm0: (...,) initial transmittance."""
    ox, oy, oz = origin
    dx, dy, dz = ray_dir
    shape = transm0.shape

    def cond(c):
        i, _t, _tr, _pd, done = c
        return (i < num_samples) & ~jnp.all(done)

    def body(c):
        i, t, transm, prev_density, done = c
        px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
        done = done | (jnp.abs(px) > 1.0) | (jnp.abs(py) > 1.0) | (jnp.abs(pz) > 1.0)
        density = indexed_trilinear_soa(
            volumes, tex_id, px * 0.5 + 0.5, py * 0.5 + 0.5, pz * 0.5 + 0.5
        )[3]

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
        jnp.broadcast_to(step_scale, shape).astype(jnp.float32),  # t = 1 step
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
    point_light: bool = False,
    z_slab=None,  # (z0 traced, zc static): march only light-grid z rows
                  # [z0, z0+zc) — same math, 1/(L/zc) the rays per
                  # dispatch. The demo-scale fidelity warmup marches a
                  # 96^3 grid x 2 rays x 96 steps through 64 volumes per
                  # call; one full-grid dispatch runs minutes on a chip
                  # and has crashed the remote TPU worker — slabs keep
                  # each dispatch short (tools/fidelity_demo.py).
) -> jnp.ndarray:
    """Refresh one volume's light map; returns the updated channel-mid
    (N, 3, L, L, L) stack.

    point_light mirrors the `_POINT_LIGHT_` compile switch
    (`CSRayMarchL.hlsl:87-92`): the march direction becomes the per-voxel
    direction toward the light *point* (light_pos with w = 1) instead of
    the directional light's constant vector."""
    n = vol_tex_ids.shape[0]
    l = light_maps.shape[-1]
    vid = select_update_volume(cull.visible, frame_idx)

    step_scale = MAX_DIST / float(max_light_samples)

    # Voxel centers of the target volume's light grid, in its local space.
    ts = (jnp.arange(l, dtype=jnp.float32) + 0.5) / l * 2.0 - 1.0
    if z_slab is not None:
        z0, zc = z_slab
        ts_z = jax.lax.dynamic_slice(ts, (z0,), (zc,))
    else:
        ts_z = ts
    lz, ly_, lx = jnp.meshgrid(ts_z, ts, ts, indexing="ij")
    gshape = lz.shape  # (zc, L, L) under z_slab, else (L, L, L)

    tex_id = vol_tex_ids[vid]
    tex_idx = jnp.broadcast_to(tex_id, gshape).astype(jnp.int32)
    u, v, w = lx * 0.5 + 0.5, ly_ * 0.5 + 0.5, lz * 0.5 + 0.5
    density = indexed_trilinear_soa(volumes, tex_idx, u, v, w)[3]
    has_density = density >= ZERO_THRESHOLD

    world = per_object.world[vid]
    wx = lx * world[0, 0] + ly_ * world[1, 0] + lz * world[2, 0] + world[3, 0]
    wy = lx * world[0, 1] + ly_ * world[1, 1] + lz * world[2, 1] + world[3, 1]
    wz = lx * world[0, 2] + ly_ * world[1, 2] + lz * world[2, 2] + world[3, 2]

    if shadow_map is not None:
        shadow = shadow_test_soa(wx, wy, wz, shadow_map, shadow_vp)
    else:
        shadow = jnp.ones(gshape, jnp.float32)

    # SH ambient: AO ray along the negated density gradient
    # (`CSRayMarchL.hlsl:61-75`).
    if has_light_probe:
        gx, gy, gz = density_gradient_soa(volumes, tex_idx, u, v, w)
        ax_, ay_, az_ = -gx, -gy, -gz
        zero_grad = (jnp.abs(ax_) + jnp.abs(ay_) + jnp.abs(az_)) <= 0.0
        ax_ = jnp.where(zero_grad, lx, ax_)
        ay_ = jnp.where(zero_grad, ly_, ay_)
        az_ = jnp.where(zero_grad, lz, az_)
        # to world (rotation part of `world`)
        awx = ax_ * world[0, 0] + ay_ * world[1, 0] + az_ * world[2, 0]
        awy = ax_ * world[0, 1] + ay_ * world[1, 1] + az_ * world[2, 1]
        awz = ax_ * world[0, 2] + ay_ * world[1, 2] + az_ * world[2, 2]
        inv = jax.lax.rsqrt(jnp.maximum(awx * awx + awy * awy + awz * awz, 1e-20))
        awx, awy, awz = awx * inv, awy * inv, awz * inv
        # SH irradiance per channel without a trailing-3 array
        nrm = jnp.stack([awx, awy, awz], 0)  # (3, L, L, L) channel-leading
        irr = sh_lib.eval_irradiance(
            sh_coeffs, jnp.moveaxis(nrm, 0, -1)
        )  # (L, L, L, 3) transient
        irr_r, irr_g, irr_b = irr[..., 0], irr[..., 1], irr[..., 2]
    else:
        awx = awy = awz = jnp.zeros_like(wx)
        irr_r = irr_g = irr_b = jnp.zeros_like(wx)

    ldx, ldy, ldz = light_pos[0], light_pos[1], light_pos[2]  # directional

    # March through every volume in the scene (`CSRayMarchL.hlsl:77-110`).
    def per_volume(carry, inputs):
        shadow_c, ao_c = carry
        world_i_n, tex_n, is_self = inputs

        m = world_i_n
        onx = wx * m[0, 0] + wy * m[1, 0] + wz * m[2, 0] + m[3, 0]
        ony = wx * m[0, 1] + wy * m[1, 1] + wz * m[2, 1] + m[3, 1]
        onz = wx * m[0, 2] + wy * m[1, 2] + wz * m[2, 2] + m[3, 2]
        tex_b = jnp.broadcast_to(tex_n, gshape).astype(jnp.int32)

        if point_light:
            # `_POINT_LIGHT_`: local light point (full affine transform,
            # w = 1), per-voxel direction toward it
            lpx = ldx * m[0, 0] + ldy * m[1, 0] + ldz * m[2, 0] + m[3, 0]
            lpy = ldx * m[0, 1] + ldy * m[1, 1] + ldz * m[2, 1] + m[3, 1]
            lpz = ldx * m[0, 2] + ldy * m[1, 2] + ldz * m[2, 2] + m[3, 2]
            lvxb, lvyb, lvzb = lpx - onx, lpy - ony, lpz - onz
            linv = jax.lax.rsqrt(jnp.maximum(
                lvxb * lvxb + lvyb * lvyb + lvzb * lvzb, 1e-20))
            lvxb, lvyb, lvzb = lvxb * linv, lvyb * linv, lvzb * linv
        else:
            # directional-light transmittance (rotation-only transform)
            lvx = ldx * m[0, 0] + ldy * m[1, 0] + ldz * m[2, 0]
            lvy = ldx * m[0, 1] + ldy * m[1, 1] + ldz * m[2, 1]
            lvz = ldx * m[0, 2] + ldy * m[1, 2] + ldz * m[2, 2]
            linv = jax.lax.rsqrt(jnp.maximum(
                lvx * lvx + lvy * lvy + lvz * lvz, 1e-20))
            lvx, lvy, lvz = lvx * linv, lvy * linv, lvz * linv
            lvxb = jnp.broadcast_to(lvx, onx.shape)
            lvyb = jnp.broadcast_to(lvy, onx.shape)
            lvzb = jnp.broadcast_to(lvz, onx.shape)

        cx, cy, cz, hit = raymarch.compute_ray_origin_soa(
            onx, ony, onz, lvxb, lvyb, lvzb
        )
        active = has_density & hit & (shadow_c >= ZERO_THRESHOLD)
        shadow_c = cast_light_ray(
            volumes, tex_b, (cx, cy, cz), (lvxb, lvyb, lvzb), shadow_c,
            step_scale, max_light_samples, active,
        )

        if has_light_probe:
            avx = awx * m[0, 0] + awy * m[1, 0] + awz * m[2, 0]
            avy = awx * m[0, 1] + awy * m[1, 1] + awz * m[2, 1]
            avz = awx * m[0, 2] + awy * m[1, 2] + awz * m[2, 2]
            ainv = jax.lax.rsqrt(jnp.maximum(avx * avx + avy * avy + avz * avz, 1e-20))
            avx, avy, avz = avx * ainv, avy * ainv, avz * ainv
            c2x, c2y, c2z, hit2 = raymarch.compute_ray_origin_soa(
                onx, ony, onz, avx, avy, avz
            )
            active2 = has_density & hit2
            transm = cast_light_ray(
                volumes, tex_b, (c2x, c2y, c2z), (avx, avy, avz),
                jnp.ones(gshape, jnp.float32),
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
        (shadow, jnp.ones(gshape, jnp.float32)),
        (per_object.world_i, vol_tex_ids, is_self),
    )

    lcol = light_color[:3] * light_color[3]
    amb = ambient[:3] * ambient[3]
    if has_light_probe:
        # Empty voxels never compute irradiance in the reference
        # (`CSRayMarchL.hlsl:58-75`): their ambient term is zero.
        amb_r = jnp.where(has_density, ao * irr_r, 0.0)
        amb_g = jnp.where(has_density, ao * irr_g, 0.0)
        amb_b = jnp.where(has_density, ao * irr_b, 0.0)
    else:
        amb_r = jnp.full(gshape, amb[0])
        amb_g = jnp.full(gshape, amb[1])
        amb_b = jnp.full(gshape, amb[2])

    new_map = jnp.stack(
        [
            shadow * lcol[0] + amb_r,
            shadow * lcol[1] + amb_g,
            shadow * lcol[2] + amb_b,
        ],
        axis=0,
    )
    if z_slab is not None:
        zero = jnp.zeros((), jnp.int32)
        return jax.lax.dynamic_update_slice(
            light_maps, new_map.astype(light_maps.dtype)[None],
            (vid, zero, z0, zero, zero))
    return light_maps.at[vid].set(new_map.astype(light_maps.dtype))
