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
semantics the plane-sweep path (`multivolumes_tpu.render.sweep`) must
reproduce, and doubles as the CPU/interpret-mode twin (the rebuild's
analog of the reference's WARP software-device path).

TPU layout: everything is structure-of-arrays — rays are tuples of scalar
fields (x, y, z / r, g, b, a as separate (...,) arrays), never (..., 3)
vectors. TPU tiling pads a trailing dim of 3 or 4 to 128 lanes (a 32x
memory blowup); with SoA every buffer tiles perfectly on its spatial dims.

GPU-driven dispatch in the reference (`ExecuteIndirect` over the compacted
visible list / D3D12 work graphs, `MultiRayCaster.cpp:1329-1438`) becomes
dense predication: all N volumes x 6 faces x S^2 texels are computed with
per-ray validity masks; masked rays are `done` from step 0 so the global
while-loop early-out still ends the work when every live ray terminates.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from multivolumes_tpu.config import SharedConsts
from multivolumes_tpu.core import math3d
from multivolumes_tpu.ops.trilinear import indexed_trilinear_soa
from multivolumes_tpu.render.cull import CullResult
from multivolumes_tpu.render.perframe import PerObject

ABSORPTION = SharedConsts.ABSORPTION
ZERO_THRESHOLD = SharedConsts.ZERO_THRESHOLD
MAX_DIST = SharedConsts.MAX_DIST
FLT_MAX = 3.402823466e38


# ---------------------------------------------------------------------------
# SoA geometry helpers (xyz as separate scalar fields)
# ---------------------------------------------------------------------------

def _safe(d, eps=1e-12):
    return jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))


def get_local_pos_soa(px, py, face):
    """Interior-face texel -> local position (x, y, z) tuple.

    Port of `GetLocalPos` (`CSRayMarch.hlsl:28-53`); face may broadcast.
    """
    one = jnp.ones_like(px)
    fx = [one, -one, px, px, px, -px]
    fy = [py, py, one, -one, py, py]
    fz = [-px, px, -py, py, one, -one]

    def sel(cands):
        out = cands[0]
        for i in range(1, 6):
            out = jnp.where(face == i, cands[i], out)
        return out

    return sel(fx), sel(fy), sel(fz)


def compute_ray_origin_soa(ox, oy, oz, dx, dy, dz):
    """Clip ray start to the unit box (`ComputeRayOrigin`,
    `RayMarch.hlsli:128-155`). SoA in, SoA out + hit mask."""
    inside = (jnp.abs(ox) <= 1.0) & (jnp.abs(oy) <= 1.0) & (jnp.abs(oz) <= 1.0)

    comps = ((ox, dx), (oy, dy), (oz, dz))
    big = jnp.full_like(ox, FLT_MAX)
    best_u = big
    any_hit = jnp.zeros_like(inside)
    for i in range(3):
        o_i, d_i = comps[i]
        u = (-jnp.sign(_safe(d_i)) - o_i) / _safe(d_i)
        ok = (u >= 0.0) & (jnp.abs(d_i) > 1e-12)
        for j in range(3):
            if j == i:
                continue
            o_j, d_j = comps[j]
            ok = ok & (jnp.abs(d_j * u + o_j) <= 1.0 + 1e-6)
        best_u = jnp.where(ok & (u < best_u), u, best_u)
        any_hit = any_hit | ok

    u = jnp.where(any_hit, best_u, 0.0)
    cx = jnp.clip(ox + dx * u, -1.0, 1.0)
    cy = jnp.clip(oy + dy * u, -1.0, 1.0)
    cz = jnp.clip(oz + dz * u, -1.0, 1.0)
    nx = jnp.where(inside, ox, cx)
    ny = jnp.where(inside, oy, cy)
    nz = jnp.where(inside, oz, cz)
    return nx, ny, nz, inside | any_hit


def compute_target_hit_soa(ox, oy, oz, tx, ty, tz, dx, dy, dz):
    """`ComputeTargetHit` (`RayMarch.hlsli:160-165`)."""
    ux = (tx - ox) / _safe(dx)
    uy = (ty - oy) / _safe(dy)
    uz = (tz - oz) / _safe(dz)
    return jnp.maximum(jnp.maximum(ux, uy), uz)


def get_t_max_soa(cx, cy, cz, ox, oy, oz, dx, dy, dz, wvp_i):
    """Occluded end point from a scene-depth sample (`GetTMax`,
    `RayMarch.hlsli:82-97`). clip pos (cx, cy, cz=z); wvp_i: (..., 4, 4)
    broadcastable row-vector inverse matrix, or (..., 16) row-major
    flat rows — per-element-gathered matrices MUST use the flat form: a
    (..., 4, 4) gather result tiles its minor (4, 4) dims as T(4, 128)
    on TPU (32x HBM padding — 15.6 GB at 8 layers x 1280x800, the
    round-5 fidelity-run OOM), while a 16-wide row stays a plain row
    gather."""
    flat16 = wvp_i.shape[-1] == 16

    def m(r, c):
        return wvp_i[..., r * 4 + c] if flat16 else wvp_i[..., r, c]

    hw = cx * m(0, 3) + cy * m(1, 3) + cz * m(2, 3) + m(3, 3)
    hw = _safe(hw, 1e-20)

    def unproj(col):
        return (
            cx * m(0, col)
            + cy * m(1, col)
            + cz * m(2, col)
            + m(3, col)
        ) / hw

    px, py, pz = unproj(0), unproj(1), unproj(2)
    tx = (px - ox) / _safe(dx)
    ty = (py - oy) / _safe(dy)
    tz = (pz - oz) / _safe(dz)
    t = jnp.maximum(jnp.maximum(tx, ty), tz)
    return jnp.where(cz >= 1.0, FLT_MAX, t)


def get_step(d_density, transm, density, step_scale):
    """Adaptive step size (`GetStep`, `RayMarch.hlsli:182-192`)."""
    factor_ev = jnp.minimum(1.0 / 256.0 / jnp.maximum(jnp.abs(d_density), 1e-20), 2.0)
    factor_ui = jnp.minimum(1.0 - density, 1.0)
    factor_th = 1.0 - transm
    return step_scale * jnp.maximum(1.5 * factor_ev * factor_ui * factor_th, 1.0)


# ---------------------------------------------------------------------------
# The march
# ---------------------------------------------------------------------------

class MarchResult(NamedTuple):
    r: jnp.ndarray
    g: jnp.ndarray
    b: jnp.ndarray
    a: jnp.ndarray
    steps: jnp.ndarray


def march_scatter(
    sample_fn: Callable,   # (u, v, w) -> (cr, cg, cb, density)
    light_fn: Callable,    # (u, v, w) -> (lr, lg, lb)
    origin,                # (ox, oy, oz) scalar fields, box-clipped
    direction,             # (dx, dy, dz)
    t_max,                 # (...,)
    smp_count,             # (...,) int32
    step_scale,            # (...,)
    max_steps: int,
    active,                # (...,) bool
    adaptive: bool = True,
) -> MarchResult:
    """Front-to-back scatter accumulation — the inner loop of
    `CSRayMarch.hlsl:112-155` with break -> done-mask semantics and a
    global all-done early-out (`lax.while_loop`)."""
    ox, oy, oz = origin
    dx, dy, dz = direction
    shape = t_max.shape
    f32 = ox.dtype

    def cond(carry):
        i = carry[0]
        done = carry[-1]
        return (i < max_steps) & ~jnp.all(done)

    def body(carry):
        i, t, sr, sg, sb, sa, prev_density, done = carry
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        out_of_box = (jnp.abs(px) > 1.0) | (jnp.abs(py) > 1.0) | (jnp.abs(pz) > 1.0)
        done = done | out_of_box | (i >= smp_count)

        u = px * 0.5 + 0.5
        v = py * 0.5 + 0.5
        w = pz * 0.5 + 0.5
        cr, cg, cb, density = sample_fn(u, v, w)
        occupied = density > ZERO_THRESHOLD

        transm = 1.0 - sa
        lr, lg, lb = light_fn(u, v, w)

        if adaptive:
            new_step = jnp.where(
                occupied,
                get_step(density - prev_density, transm, density, step_scale),
                step_scale,
            )
        else:
            new_step = jnp.broadcast_to(step_scale, shape).astype(f32)

        k = ABSORPTION * transm
        do_acc = occupied & ~done
        kk = jnp.where(do_acc, k, 0.0)
        sr = sr + cr * density * lr * kk
        sg = sg + cg * density * lg * kk
        sb = sb + cb * density * lb * kk
        sa = sa + density * kk
        prev_density = jnp.where(do_acc, density, prev_density)
        done = done | (occupied & (transm < ZERO_THRESHOLD))

        t = jnp.where(done, t, t + new_step)
        done = done | (t > t_max)
        return (i + 1, t, sr, sg, sb, sa, prev_density, done)

    z = jnp.zeros(shape, f32)
    init = (jnp.asarray(0, jnp.int32), z, z, z, z, z, z, ~active)
    out = jax.lax.while_loop(cond, body, init)
    _i, _t, sr, sg, sb, sa = out[0], out[1], out[2], out[3], out[4], out[5]
    return MarchResult(r=sr, g=sg, b=sb, a=sa, steps=_i)


class CubeMaps(NamedTuple):
    color: jnp.ndarray  # (N, 6, 4, S, S) — channel-mid so minor dims tile
    depth: jnp.ndarray  # (N, 6, S, S) clip-space z of the scene behind


def _transform_point_soa(x, y, z, m):
    """Row-vector transform of SoA points; m (..., 4, 4) broadcastable.
    Returns (hx, hy, hz, hw)."""
    hx = x * m[..., 0, 0] + y * m[..., 1, 0] + z * m[..., 2, 0] + m[..., 3, 0]
    hy = x * m[..., 0, 1] + y * m[..., 1, 1] + z * m[..., 2, 1] + m[..., 3, 1]
    hz = x * m[..., 0, 2] + y * m[..., 1, 2] + z * m[..., 2, 2] + m[..., 3, 2]
    hw = x * m[..., 0, 3] + y * m[..., 1, 3] + z * m[..., 2, 3] + m[..., 3, 3]
    return hx, hy, hz, hw


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
    (`MultiRayCaster.cpp:1329-1368`). Per-volume LOD marches the texel grid
    at the mip resolution S >> mip, stored in the top-left corner of the
    full-resolution buffer (consumers rescale UVs by S_mip/S).
    """
    n = vol_tex_ids.shape[0]
    s = cube_map_size

    eye_local = math3d.transform_point3(eye, per_object.world_i)  # (N,3)

    mip = cull.mip_level
    s_mip = (s >> jnp.minimum(mip, 31)).astype(jnp.float32)  # (N,)

    ij = jnp.arange(s, dtype=jnp.float32)
    jj, ii = jnp.meshgrid(ij, ij, indexing="ij")

    # (N, 6, S, S) ray grids — SoA throughout.
    sm = s_mip[:, None, None, None]
    px = (ii[None, None] + 0.5) / sm * 2.0 - 1.0
    py = -((jj[None, None] + 0.5) / sm * 2.0 - 1.0)
    texel_valid = (ii[None, None] < sm) & (jj[None, None] < sm)

    face = jnp.arange(6, dtype=jnp.int32)[None, :, None, None]
    tx, ty, tz = get_local_pos_soa(px, py, face)

    ex = eye_local[:, 0, None, None, None]
    ey = eye_local[:, 1, None, None, None]
    ez = eye_local[:, 2, None, None, None]
    ox = jnp.broadcast_to(ex, tx.shape)
    oy = jnp.broadcast_to(ey, tx.shape)
    oz = jnp.broadcast_to(ez, tx.shape)

    dxu, dyu, dzu = tx - ox, ty - oy, tz - oz
    inv_len = jax.lax.rsqrt(jnp.maximum(dxu * dxu + dyu * dyu + dzu * dzu, 1e-20))
    dx, dy, dz = dxu * inv_len, dyu * inv_len, dzu * inv_len

    ox, oy, oz, is_hit = compute_ray_origin_soa(ox, oy, oz, dx, dy, dz)
    t_max = compute_target_hit_soa(ox, oy, oz, tx, ty, tz, dx, dy, dz)

    active = (
        is_hit
        & cull.face_mask[:, :, None, None]
        & texel_valid
        & cull.visible[:, None, None, None]
        & cull.use_cube_map[:, None, None, None]
    )

    if depth_map is not None:
        prx, pry, prz = ox + 0.01 * dx, oy + 0.01 * dy, oz + 0.01 * dz
        wvp = per_object.world_view_proj[:, None, None, None]
        hx, hy, _hz, hw = _transform_point_soa(prx, pry, prz, wvp)
        hw = _safe(hw, 1e-20)
        cx, cy = hx / hw, hy / hw
        uu = cx * 0.5 + 0.5
        vv = 1.0 - (cy * 0.5 + 0.5)
        hd, wd = depth_map.shape
        xi = jnp.clip((uu * wd).astype(jnp.int32), 0, wd - 1)
        yi = jnp.clip((vv * hd).astype(jnp.int32), 0, hd - 1)
        z = depth_map[yi, xi]
        cube_depth = z
        t_occ = get_t_max_soa(
            cx, cy, z, ox, oy, oz, dx, dy, dz,
            per_object.world_view_proj_i[:, None, None, None],
        )
        t_max = jnp.minimum(t_max, t_occ)
    else:
        cube_depth = jnp.ones(tx.shape, jnp.float32)

    smp_count = jnp.broadcast_to(cull.smp_count[:, None, None, None], tx.shape)
    step_scale = MAX_DIST / jnp.maximum(smp_count.astype(jnp.float32), 1.0)

    tex_idx = jnp.broadcast_to(
        vol_tex_ids[:, None, None, None], tx.shape
    ).astype(jnp.int32)
    lm_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None, None, None], tx.shape
    )

    def sample_fn(u, v, w):
        return indexed_trilinear_soa(volumes, tex_idx, u, v, w)

    def light_fn(u, v, w):
        return indexed_trilinear_soa(light_maps, lm_idx, u, v, w)

    res = march_scatter(
        sample_fn, light_fn, (ox, oy, oz), (dx, dy, dz), t_max,
        smp_count, step_scale, max_steps, active, adaptive,
    )
    inv2pi = 1.0 / (2.0 * math.pi)
    zero = jnp.zeros_like(res.a)
    color = jnp.stack(
        [
            jnp.where(active, res.r * inv2pi, zero),
            jnp.where(active, res.g * inv2pi, zero),
            jnp.where(active, res.b * inv2pi, zero),
            jnp.where(active, res.a, zero),
        ],
        axis=2,
    )
    return CubeMaps(color=color, depth=cube_depth)


# --- AoS compatibility wrappers (setup-time use and tests) -----------------

def compute_ray_origin(ray_origin, ray_dir):
    """AoS wrapper over compute_ray_origin_soa: (..., 3) in/out."""
    ox, oy, oz, hit = compute_ray_origin_soa(
        ray_origin[..., 0], ray_origin[..., 1], ray_origin[..., 2],
        ray_dir[..., 0], ray_dir[..., 1], ray_dir[..., 2],
    )
    return jnp.stack([ox, oy, oz], -1), hit


def get_t_max(clip_pos, ray_origin, ray_dir, world_view_proj_i):
    """AoS wrapper over get_t_max_soa."""
    return get_t_max_soa(
        clip_pos[..., 0], clip_pos[..., 1], clip_pos[..., 2],
        ray_origin[..., 0], ray_origin[..., 1], ray_origin[..., 2],
        ray_dir[..., 0], ray_dir[..., 1], ray_dir[..., 2],
        world_view_proj_i,
    )


def compute_target_hit(ray_origin, target, ray_dir):
    return compute_target_hit_soa(
        ray_origin[..., 0], ray_origin[..., 1], ray_origin[..., 2],
        target[..., 0], target[..., 1], target[..., 2],
        ray_dir[..., 0], ray_dir[..., 1], ray_dir[..., 2],
    )


def get_local_pos(pos2d, face):
    x, y, z = get_local_pos_soa(pos2d[..., 0], pos2d[..., 1], face)
    return jnp.stack([x, y, z], -1)
