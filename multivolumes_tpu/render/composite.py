"""Screen-space compositing: cube-map sampling, the paper's depth-aware AA
filter, per-pixel march fallback, and order-independent transparency.

This one module subsumes the reference's entire OIT machinery — the
8-layer k-buffer depth peel (`PSDepthPeel.hlsl`), the cube raster + shade
pass (`VSCube.hlsl` + `PSCube.hlsl`), the ray-query variant
(`PSCubeRT.hlsl`), the DXR pipeline variant (`RTCube.hlsl`) and the resolve
(`PSResolveOIT.hlsl`) — with one TPU-native formulation: per pixel,
analytically intersect the camera ray with all N volume AABBs (the unit
cube is the only geometry, `MultiRayCaster.cpp:387-453`), keep the
`NUM_OIT_LAYERS` nearest exit points (`lax.top_k` instead of
InterlockedMin cascades), shade each layer with `CubeCast` (the paper's
depth-aware seam-free bilinear filter, `PSCube.hlsli:51-108`) or the
`RayCast` per-pixel march fallback (`RayCast.hlsli:43-108`), and
front-to-back under-blend. No atomics, no BVH, no rasterizer.

All texture reads are pointwise multi-index gathers (volume id is just
another index coordinate), so nothing larger than the ray grid is ever
materialized.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from multivolumes_tpu.config import SharedConsts
from multivolumes_tpu.core import math3d
from multivolumes_tpu.ops.trilinear import indexed_trilinear
from multivolumes_tpu.render import raymarch
from multivolumes_tpu.render.cull import CullResult
from multivolumes_tpu.render.perframe import PerObject

FLT_MAX = 3.402823466e38


# ---------------------------------------------------------------------------
# Cube-map addressing
# ---------------------------------------------------------------------------

def dir_to_face_uv(d):
    """Direction -> (face id, face uv in [0,1]^2).

    Inverse of `GetLocalPos` (`CSRayMarch.hlsl:28-53`): face order
    +X,-X,+Y,-Y,+Z,-Z, u right / v down within each face.
    """
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    x, y, z = d[..., 0], d[..., 1], d[..., 2]

    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)

    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)

    major = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    inv = 1.0 / jnp.maximum(major, 1e-20)
    xs, ys, zs = x * inv, y * inv, z * inv

    # px, py such that GetLocalPos(face, px, py) == projected point
    px = jnp.where(
        is_x,
        jnp.where(x >= 0, -zs, zs),
        jnp.where(is_y, xs, jnp.where(z >= 0, xs, -xs)),
    )
    py = jnp.where(is_y, jnp.where(y >= 0, -zs, zs), ys)

    u = px * 0.5 + 0.5
    v = -py * 0.5 + 0.5  # py = -(v*2-1)
    return face, jnp.stack([u, v], -1)


def _face_axis_coords(u, n_eff, size: int):
    """Linear-sampler axis coords against a traced effective size (mips are
    stored in the top-left n_eff x n_eff corner of a `size`-wide buffer)."""
    x = u * n_eff - 0.5
    x0 = jnp.floor(x)
    f = (x - x0).astype(jnp.float32)
    base = x0.astype(jnp.int32)
    hi = jnp.minimum(n_eff.astype(jnp.int32) - 1, size - 1)
    i0 = jnp.clip(base, 0, hi)
    i1 = jnp.clip(base + 1, 0, hi)
    return i0, i1, f


def _cube_taps(d, n_eff, size: int):
    """Shared addressing for cube sample/gather: returns
    (face, uv, (x0, x1, fx), (y0, y1, fy))."""
    face, uv = dir_to_face_uv(d)
    xc = _face_axis_coords(uv[..., 0], n_eff, size)
    yc = _face_axis_coords(uv[..., 1], n_eff, size)
    return face, uv, xc, yc


def sample_cube(cube_color, vol_id, d, n_eff):
    """Bilinear cube-map sample by direction, per-ray volume indexing.

    cube_color: (N, 6, S, S, C); vol_id, n_eff: (...,); d: (..., 3).
    """
    size = cube_color.shape[-2]
    face, _uv, (x0, x1, fx), (y0, y1, fy) = _cube_taps(d, n_eff, size)
    fx, fy = fx[..., None], fy[..., None]
    c0 = cube_color[vol_id, face, y0, x0] * (1 - fx) + cube_color[vol_id, face, y0, x1] * fx
    c1 = cube_color[vol_id, face, y1, x0] * (1 - fx) + cube_color[vol_id, face, y1, x1] * fx
    return c0 * (1 - fy) + c1 * fy


# ---------------------------------------------------------------------------
# CubeCast — the paper's depth-aware AA filter (PSCube.hlsli)
# ---------------------------------------------------------------------------

def unproject_z(depth):
    """Clip depth -> view-space z (`UnprojectZ`, `PSCube.hlsli:21-26`)."""
    zn, zf = SharedConsts.Z_NEAR, SharedConsts.Z_FAR
    return (zn * zf) / (depth * (zn - zf) + zf)


def get_domain(uv, pos, ray_dir, grid_size):
    """Custom bilinear domain with exterior-edge clamping
    (`GetDomain`, `PSCube.hlsli:31-46`). uv in [0,1], grid_size (...,)."""
    uvp = uv * grid_size[..., None]
    domain = jnp.mod(uvp + 0.5, 1.0)

    bound = grid_size - 1.0
    axes = pos * grid_size[..., None]
    clamp_needed = jnp.any(
        (jnp.abs(axes) > bound[..., None]) & (axes * ray_dir < 0.0), axis=-1
    )
    uv_c = jnp.minimum(uvp, grid_size[..., None] - 0.5)
    snapped = jnp.where(uv_c < 0.5, 1.0, 0.0)
    return jnp.where(clamp_needed[..., None], snapped, domain)


def cube_cast(cube_color, cube_depth, vol_id, n_eff, pos, ray_dir, scene_depth):
    """The depth-aware seam-free cube-map filter (`CubeCast`,
    `PSCube.hlsli:51-108`).

    cube_color: (N, 6, S, S, 4); cube_depth: (N, 6, S, S); vol_id, n_eff,
    scene_depth: (...,); pos/ray_dir: (..., 3) local exit point/direction.
    Returns (..., 4) premultiplied color.
    """
    size = cube_color.shape[-2]
    face, uv, (x0, x1, _fx), (y0, y1, _fy) = _cube_taps(pos, n_eff, size)

    color = sample_cube(cube_color, vol_id, pos, n_eff)

    # Gather component order (x,y,z,w) = (x0,y1),(x1,y1),(x1,y0),(x0,y0)
    taps = ((x0, y1), (x1, y1), (x1, y0), (x0, y0))
    samples = jnp.stack([cube_color[vol_id, face, yi, xi] for xi, yi in taps], -2)
    zs = jnp.stack([cube_depth[vol_id, face, yi, xi] for xi, yi in taps], -1)

    neff_f = n_eff.astype(jnp.float32)
    domain = get_domain(uv, pos, ray_dir, neff_f)
    dx, dy = domain[..., 0], domain[..., 1]
    wb = jnp.stack(
        [(1 - dx) * dy, dx * dy, dx * (1 - dy), (1 - dx) * (1 - dy)], -1
    )

    depth_v = unproject_z(scene_depth)[..., None]
    z_v = unproject_z(zs)
    w = jnp.maximum(1.0 - 0.5 * jnp.abs(depth_v - z_v), 0.0) * wb

    ws = jnp.sum(w, -1)
    result = jnp.sum(samples * w[..., None], -2) / jnp.maximum(ws, 1e-20)[..., None]
    return jnp.where(ws[..., None] > 0.0, result, color)


# ---------------------------------------------------------------------------
# OIT composite
# ---------------------------------------------------------------------------

def screen_rays(width: int, height: int, screen_to_world, eye):
    """Per-pixel world rays: -> (ndc xy (H, W, 2), dir (H, W, 3))."""
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = -((jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0 - 1.0)
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
    xy = jnp.stack([xg, yg], -1)  # (H,W,2)
    # Unproject a mid-depth point (not z=1: the far plane's homogeneous w
    # cancels to ~0 in fp32); any point on the ray gives the direction.
    far_h = math3d.transform_point(
        jnp.concatenate([xy, jnp.full_like(xy[..., :1], 0.5)], -1),
        screen_to_world,
    )
    far = far_h[..., :3] / far_h[..., 3:4]
    d = math3d.normalize(far - eye)
    return xy, d


def ray_box_exit(origin_local, dir_local, eps: float = 1e-12):
    """Slab test with the unit cube: -> (hit, t_exit). origin/dir (..., 3)."""
    safe = jnp.where(jnp.abs(dir_local) > eps, dir_local,
                     jnp.where(dir_local >= 0, eps, -eps))
    t1 = (-1.0 - origin_local) / safe
    t2 = (1.0 - origin_local) / safe
    t_near = jnp.max(jnp.minimum(t1, t2), -1)
    t_far = jnp.min(jnp.maximum(t1, t2), -1)
    hit = t_far > jnp.maximum(t_near, 0.0)
    return hit, t_far


def composite_oit(
    cube_maps: raymarch.CubeMaps,   # color (N,6,S,S,4), depth (N,6,S,S)
    volumes,                        # (N_src, D, H, W, 4)
    vol_tex_ids,                    # (N,)
    light_maps,                     # (N, L, L, L, 3)
    per_object: PerObject,
    cull: CullResult,
    eye,
    screen_to_world,
    depth_map,                      # (H, W) scene clip depth or None
    width: int,
    height: int,
    max_steps: int,
    num_layers: int = SharedConsts.NUM_OIT_LAYERS,
    adaptive: bool = True,
):
    """Full OIT composite -> (H, W, 4) premultiplied scene-space volume
    color, alpha clamped to 0.9997 (`PSResolveOIT.hlsl:23`)."""
    n = per_object.world.shape[0]
    s = cube_maps.color.shape[-2]
    num_layers = min(num_layers, n)

    xy, dir_world = screen_rays(width, height, screen_to_world, eye)

    # Local-space rays per volume: (N, H, W, 3)
    eye_local = math3d.transform_point3(eye, per_object.world_i)  # (N,3)
    dir_local = math3d.transform_vector(
        dir_world[None], per_object.world_i[:, None, None]
    )
    origin_local = jnp.broadcast_to(
        eye_local[:, None, None, :], (n, height, width, 3)
    )

    hit, t_exit = ray_box_exit(origin_local, dir_local)
    exit_pos = origin_local + dir_local * t_exit[..., None]

    # Fragment depth = clip z of the exit (interior-face) point, matching
    # what the rasterized `VSCubeDP` fragments would carry.
    h4 = math3d.transform_point(exit_pos, per_object.world_view_proj[:, None, None])
    exit_z = h4[..., 2] / jnp.maximum(h4[..., 3], 1e-20)
    in_front = h4[..., 3] > 0.0

    scene_z = depth_map if depth_map is not None else jnp.ones((height, width), jnp.float32)
    valid = (
        hit
        & in_front
        & cull.visible[:, None, None]
        & (exit_z <= scene_z[None])
        & (exit_z > 0.0)
    )

    # Nearest `num_layers` fragments per pixel (replaces the k-buffer peel).
    key = jnp.where(valid, exit_z, FLT_MAX)  # (N,H,W)
    key = jnp.moveaxis(key, 0, -1)           # (H,W,N)
    neg_top, layer_vol = jax.lax.top_k(-key, num_layers)  # (H,W,K)
    layer_z = -neg_top
    layer_valid = layer_z < FLT_MAX * 0.5
    layer_vol = layer_vol.astype(jnp.int32)

    # Per-layer ray data gathered by volume id (small per-ray quantities only)
    l_eye = eye_local[layer_vol]                     # (H,W,K,3)
    l_dir = math3d.transform_vector(
        dir_world[:, :, None, :], per_object.world_i[layer_vol]
    )                                                # (H,W,K,3)
    _, l_texit = ray_box_exit(l_eye, l_dir)
    l_exit_pos = l_eye + l_dir * l_texit[..., None]

    n_eff = (s >> jnp.minimum(cull.mip_level, 31)).astype(jnp.int32)  # (N,)
    l_neff = n_eff[layer_vol]                        # (H,W,K)
    l_use_cube = cull.use_cube_map[layer_vol]
    l_smp = cull.smp_count[layer_vol]
    l_tex = vol_tex_ids[layer_vol]

    scene_for_filter = jnp.broadcast_to(scene_z[:, :, None], layer_z.shape)
    cc = cube_cast(
        cube_maps.color, cube_maps.depth, layer_vol, l_neff,
        l_exit_pos, l_dir, scene_for_filter,
    )

    # Per-pixel march fallback (`PSCube.hlsl:49-55`, `_ADAPTIVE_RAYMARCH_`).
    rc = _ray_cast_layers(
        volumes, l_tex, light_maps, layer_vol, per_object,
        l_eye, l_dir, xy, scene_z, l_smp, max_steps,
        active=layer_valid & ~l_use_cube, adaptive=adaptive,
    )
    color = jnp.where(l_use_cube[..., None], cc, rc)

    # `PSCube.hlsl:57`: store only if 0 < w <= 1
    store_ok = (color[..., 3] > 0.0) & (color[..., 3] <= 1.0) & layer_valid
    color = jnp.where(store_ok[..., None], color, 0.0)

    # Front-to-back under-blend (`PSResolveOIT.hlsl:17-24`)
    def blend(carry, c):
        return carry + c * (1.0 - carry[..., 3:4]), None

    result, _ = jax.lax.scan(
        blend, jnp.zeros((height, width, 4), jnp.float32),
        jnp.moveaxis(color, 2, 0),
    )
    result = result.at[..., 3].min(0.9997)
    return result


def _ray_cast_layers(volumes, l_tex, light_maps, layer_vol, per_object,
                     origin, dir_local, xy, scene_z, smp_count, max_steps,
                     active, adaptive):
    """`RayCast` (`RayCast.hlsli:43-108`) over the (H, W, K) layer grid."""
    dirn = math3d.normalize(dir_local)
    origin_c, is_hit = raymarch.compute_ray_origin(origin, dirn)
    active = active & is_hit

    wvp_i = per_object.world_view_proj_i[layer_vol]  # (H,W,K,4,4)
    clip_pos = jnp.concatenate(
        [
            jnp.broadcast_to(xy[:, :, None, :], origin.shape[:-1] + (2,)),
            jnp.broadcast_to(scene_z[:, :, None, None], origin.shape[:-1] + (1,)),
        ],
        -1,
    )
    t_max = raymarch.get_t_max(clip_pos, origin_c, dirn, wvp_i)

    step_scale = raymarch.MAX_DIST / jnp.maximum(smp_count.astype(jnp.float32), 1.0)

    def sample_fn(uvw):
        return indexed_trilinear(volumes, l_tex, uvw)

    def light_fn(uvw):
        return indexed_trilinear(light_maps, layer_vol, uvw)

    res = raymarch.march_scatter(
        sample_fn, light_fn, origin_c, dirn, t_max,
        smp_count, step_scale, max_steps, active, adaptive,
    )
    scatter = res.scatter
    scatter = scatter.at[..., :3].mul(1.0 / (2.0 * math.pi))
    return jnp.where(active[..., None], scatter, 0.0)
