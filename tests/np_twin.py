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
