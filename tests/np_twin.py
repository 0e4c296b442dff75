"""Pure-numpy per-ray twin of the marching semantics.

Implements the reference ray-march loops literally (per-ray Python loops,
`CSRayMarch.hlsl:112-155` / `RayMarch.hlsli:197-230` behavior) as the
golden model for the vectorized JAX engine — the rebuild's substitute for
the reference's WARP software-device A/B path (SURVEY.md section 4).
"""

from __future__ import annotations

import numpy as np

ABSORPTION = 0.8
ZERO_THRESHOLD = 0.01
MAX_DIST = 2.0 * np.sqrt(3.0)


def sample_trilinear(vol, uvw):
    """Linear-clamp sample, vol (D,H,W,C), uvw (3,) -> (C,)."""
    d, h, w = vol.shape[:3]
    out = np.zeros(vol.shape[-1], np.float32)
    coords = []
    for u, n in zip(uvw, (w, h, d)):
        x = u * n - 0.5
        x0 = int(np.floor(x))
        coords.append((x0, x - x0, n))
    (x0, fx, w_), (y0, fy, h_), (z0, fz, d_) = coords
    for dz, wz in ((0, 1 - fz), (1, fz)):
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                xi = min(max(x0 + dx, 0), w_ - 1)
                yi = min(max(y0 + dy, 0), h_ - 1)
                zi = min(max(z0 + dz, 0), d_ - 1)
                out = out + wz * wy * wx * vol[zi, yi, xi]
    return out


def get_step(d_density, transm, density, step_scale):
    factor_ev = min(1.0 / 256.0 / max(abs(d_density), 1e-20), 2.0)
    factor_ui = min(1.0 - density, 1.0)
    factor_th = 1.0 - transm
    return step_scale * max(1.5 * factor_ev * factor_ui * factor_th, 1.0)


def compute_ray_origin(origin, direction):
    """`ComputeRayOrigin` (`RayMarch.hlsli:128-155`)."""
    origin = np.array(origin, np.float64)
    if np.all(np.abs(origin) <= 1.0):
        return origin, True
    best_u = np.inf
    hit = False
    for i in range(3):
        if abs(direction[i]) < 1e-12:
            continue
        u = (-np.sign(direction[i]) - origin[i]) / direction[i]
        if u < 0:
            continue
        j, k = (i + 1) % 3, (i + 2) % 3
        if abs(direction[j] * u + origin[j]) > 1.0 + 1e-6:
            continue
        if abs(direction[k] * u + origin[k]) > 1.0 + 1e-6:
            continue
        if u < best_u:
            best_u = u
            hit = True
    if hit:
        origin = np.clip(origin + direction * best_u, -1.0, 1.0)
    return origin, hit


def march_view_ray(vol, light_fn, origin, direction, t_max, smp_count,
                   adaptive=True):
    """Per-ray `CSRayMarch.hlsl:112-155`. light_fn(pos_local) -> (3,)."""
    step_scale = MAX_DIST / smp_count
    scatter = np.zeros(4, np.float32)
    t = 0.0
    prev_density = 0.0
    for i in range(smp_count):
        pos = origin + direction * t
        if np.any(np.abs(pos) > 1.0):
            break
        uvw = pos * 0.5 + 0.5
        color = sample_trilinear(vol, uvw).astype(np.float64).copy()
        new_step = step_scale
        density = color[3]
        if density > ZERO_THRESHOLD:
            light = light_fn(pos)
            transm = 1.0 - scatter[3]
            d_density = density - prev_density
            if adaptive:
                new_step = get_step(d_density, transm, density, step_scale)
            prev_density = density
            rgb = color[:3] * density * light
            scatter = scatter + np.append(rgb, density) * ABSORPTION * transm
            if transm < ZERO_THRESHOLD:
                break
        t += new_step
        if t > t_max:
            break
    scatter = scatter.astype(np.float32)
    scatter[:3] /= 2.0 * np.pi
    return scatter


def cube_face_uv(d):
    """TextureCube face/uv for direction d (3,) — the inverse of
    `GetLocalPos` (`CSRayMarch.hlsl:28-53`): face order +X,-X,+Y,-Y,+Z,-Z;
    within a face, u runs right and v runs DOWN (GetLocalPos negates
    pos.y before the face switch)."""
    x, y, z = (float(v) for v in d)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        # face 0: local = (1, py, -px); face 1: local = (-1, py, px)
        face = 0 if x >= 0 else 1
        px = (-z if x >= 0 else z) / ax
        py = y / ax
    elif ay >= az:
        # face 2: local = (px, 1, -py); face 3: local = (px, -1, py)
        face = 2 if y >= 0 else 3
        px = x / ay
        py = (-z if y >= 0 else z) / ay
    else:
        # face 4: local = (px, py, 1); face 5: local = (-px, py, -1)
        face = 4 if z >= 0 else 5
        px = (x if z >= 0 else -x) / az
        py = y / az
    return face, px * 0.5 + 0.5, -py * 0.5 + 0.5


def unproject_z(depth, z_near, z_far):
    """`UnprojectZ` (`PSCube.hlsli:21-26`)."""
    return (z_near * z_far) / (depth * (z_near - z_far) + z_far)


def cube_cast(cube_color, cube_depth, n_eff, pos, ray_dir, scene_depth,
              z_near, z_far, has_depth=True):
    """Per-pixel `CubeCast` (`PSCube.hlsli:51-108`): the depth-aware
    seam-free cube-map filter, written literally from the HLSL as an
    independent check on the engine's `composite.cube_cast_soa` gather
    twin (which itself backs the Pallas tile kernel's warp filter).

    cube_color (6, 4, S, S) one volume's faces (adaptive LOD packs
    content into the top-left n_eff^2 corner, so taps clamp to
    n_eff - 1 like the engine); cube_depth (6, S, S) or None; pos (3,)
    the local-space cube surface position (`uvw = pos`); ray_dir (3,);
    scene_depth the scalar clip-space depth under this pixel. Returns
    (4,) rgba. Cube-seam taps clamp per-face (the engine's documented
    deviation from hardware seamless cube filtering; the exterior-edge
    domain clamp covers the visible band).
    """
    s = cube_color.shape[-1]
    face, u, v = cube_face_uv(pos)
    hi = min(int(n_eff), s) - 1

    def axis(c):
        x = c * n_eff - 0.5
        x0 = int(np.floor(x))
        f = x - x0
        if x0 < 0:
            f = 0.0
        return min(max(x0, 0), hi), min(max(x0 + 1, 0), hi), f

    x0, x1, fx = axis(u)
    y0, y1, fy = axis(v)
    # D3D Gather component order (x,y,z,w) = (x0,y1),(x1,y1),(x1,y0),(x0,y0)
    taps = ((x0, y1), (x1, y1), (x1, y0), (x0, y0))

    # GetDomain (`PSCube.hlsli:31-46`)
    up, vp = u * n_eff, v * n_eff
    du, dv = (up + 0.5) % 1.0, (vp + 0.5) % 1.0
    bound = n_eff - 1.0
    axes = np.asarray(pos, np.float64) * n_eff
    if np.any((np.abs(axes) > bound) & (axes * np.asarray(ray_dir) < 0.0)):
        du = 1.0 if min(up, n_eff - 0.5) < 0.5 else 0.0
        dv = 1.0 if min(vp, n_eff - 0.5) < 0.5 else 0.0
    wb = ((1 - du) * dv, du * dv, du * (1 - dv), (1 - du) * (1 - dv))
    # SampleLevel fallback = plain bilinear over the same 4 texels
    wf = ((1 - fx) * fy, fx * fy, fx * (1 - fy), (1 - fx) * (1 - fy))

    result = np.zeros(4, np.float64)
    fallback = np.zeros(4, np.float64)
    ws = 0.0
    depth_v = unproject_z(scene_depth, z_near, z_far) if has_depth else None
    for (xi, yi), wbi, wfi in zip(taps, wb, wf):
        smp = cube_color[face, :, yi, xi].astype(np.float64)
        w = wbi
        if has_depth:
            zi = unproject_z(float(cube_depth[face, yi, xi]), z_near, z_far)
            w = max(1.0 - 0.5 * abs(depth_v - zi), 0.0) * wbi
        result += smp * w
        fallback += smp * wfi
        ws += w
    return (result / ws if ws > 0.0 else fallback).astype(np.float32)


def cast_light_ray(vol, origin, direction, transm, step_scale, num_samples):
    """Per-ray `CastLightRay` (`RayMarch.hlsli:197-230`)."""
    t = step_scale
    prev_density = 0.0
    for i in range(num_samples):
        pos = origin + direction * t
        if np.any(np.abs(pos) > 1.0):
            break
        uvw = pos * 0.5 + 0.5
        density = float(sample_trilinear(vol, uvw)[3])
        d_density = density - prev_density
        opacity = min(max(density * step_scale, 0.0), 1.0)
        new_step = get_step(d_density, transm, opacity, step_scale)
        prev_density = density
        transm *= 1.0 - density * ABSORPTION
        if transm < ZERO_THRESHOLD:
            break
        t += new_step
    return transm


def density_gradient(vol, uvw):
    """`GetDensityGradient` (`RayMarch.hlsli:55-77`), non-inverted-Y:
    six 1-texel-offset linear density taps -> (3,)."""
    d, h, w = vol.shape[:3]
    u, v, ww = uvw

    def dens(du, dv, dw):
        return float(sample_trilinear(vol, (u + du, v + dv, ww + dw))[3])

    return np.array([
        dens(1.0 / w, 0, 0) - dens(-1.0 / w, 0, 0),
        dens(0, 1.0 / h, 0) - dens(0, -1.0 / h, 0),
        dens(0, 0, 1.0 / d) - dens(0, 0, -1.0 / d),
    ])


def light_texel(vols, tex_ids, worlds, world_is, vid, local_pos,
                light_dir, light_color, ambient, irradiance_fn,
                step_scale, num_samples, shadow=1.0,
                point_light=False, has_light_probe=True):
    """Per-texel `CSRayMarchL.hlsl` main() (directional light): the full
    N-volume transmittance loop + AO fan, written literally from the
    HLSL as the independent check on `lightmarch.ray_march_light`.

    vols: list of (D, H, W, 4) density grids indexed by tex id;
    worlds/world_is: (N, 4, 4) row-vector transforms; local_pos (3,) the
    texel center in volume vid's local space; irradiance_fn(dir (3,)) ->
    (3,) SH irradiance (the SH chain is validated independently in
    tests/test_sh.py); point_light mirrors `_POINT_LIGHT_` (light_dir is
    then the light POINT). Returns the (3,) light-map texel."""
    ZERO = ZERO_THRESHOLD
    vol_v = vols[tex_ids[vid]]
    uvw = np.asarray(local_pos) * 0.5 + 0.5
    density = float(sample_trilinear(vol_v, uvw)[3])
    has_density = density >= ZERO

    w_v = worlds[vid]
    world_pos = (local_pos[0] * w_v[0, :3] + local_pos[1] * w_v[1, :3]
                 + local_pos[2] * w_v[2, :3] + w_v[3, :3])

    ao = 1.0
    irradiance = np.zeros(3)
    if has_density:
        ao_dir = -density_gradient(vol_v, uvw)
        if not np.any(np.abs(ao_dir) > 0.0):
            ao_dir = np.asarray(local_pos, np.float64)
        ao_dir = (ao_dir[0] * w_v[0, :3] + ao_dir[1] * w_v[1, :3]
                  + ao_dir[2] * w_v[2, :3])
        ao_dir = ao_dir / np.linalg.norm(ao_dir)
        irradiance = np.asarray(irradiance_fn(ao_dir), np.float64)

        for n_ in range(len(worlds)):
            m = world_is[n_]
            vol_n = vols[tex_ids[n_]]
            origin_n = (world_pos[0] * m[0, :3] + world_pos[1] * m[1, :3]
                        + world_pos[2] * m[2, :3] + m[3, :3])
            if shadow >= ZERO:
                if point_light:
                    # `_POINT_LIGHT_` (`CSRayMarchL.hlsl:87-92`): the
                    # light POINT transforms with the full affine
                    # (w = 1); direction is per-texel toward it
                    lp = (light_dir[0] * m[0, :3] + light_dir[1] * m[1, :3]
                          + light_dir[2] * m[2, :3] + m[3, :3])
                    ld = lp - origin_n
                else:
                    ld = (light_dir[0] * m[0, :3] + light_dir[1] * m[1, :3]
                          + light_dir[2] * m[2, :3])
                ld = ld / np.linalg.norm(ld)
                o, hit = compute_ray_origin(origin_n.copy(), ld)
                if hit:
                    shadow = cast_light_ray(
                        vol_n, o, ld, shadow, step_scale, num_samples)
            ad = (ao_dir[0] * m[0, :3] + ao_dir[1] * m[1, :3]
                  + ao_dir[2] * m[2, :3])
            ad = ad / np.linalg.norm(ad)
            o2, hit2 = compute_ray_origin(origin_n.copy(), ad)
            if not hit2:
                continue
            transm = cast_light_ray(
                vol_n, o2, ad, 1.0, step_scale, num_samples)
            ao *= transm if n_ == vid else (
                min(max(transm + 0.5, 0.0), 1.0) ** 0.25)

    lcol = np.asarray(light_color[:3]) * light_color[3]
    if has_light_probe:
        amb = ao * irradiance if has_density else np.zeros(3)
    else:
        # `_HAS_LIGHT_PROBE_` off: the constant ambient term survives
        # (`CSRayMarchL.hlsl:114-121`)
        amb = np.asarray(ambient[:3]) * ambient[3]
    return shadow * lcol + amb
