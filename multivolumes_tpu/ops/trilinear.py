"""Linear texture sampling on arrays — the TPU's stand-in for texture units.

Implements the D3D linear-clamp sampler semantics used everywhere in the
reference (`SamplerPreset::LINEAR_CLAMP`, `MultiRayCaster.cpp:558`): texel
centers at (i + 0.5)/N, clamp addressing, separable linear filtering.

These are the *generic* gather-based versions (XLA `gather`), used by the
reference-faithful render paths and as the correctness twin for the Pallas
plane-sweep kernels in `multivolumes_tpu.ops.pallas`, which avoid gathers
entirely by resampling marching planes with MXU matmuls.

Conventions: a 3D texture is (D, H, W, C) indexed [z, y, x, c]; uvw.x walks
W, uvw.y walks H, uvw.z walks D (D3D Texture3D addressing). A 2D texture is
(H, W, C) or (H, W); uv.y walks H.
"""

from __future__ import annotations

import jax.numpy as jnp


def _axis_coords(u, n: int):
    """Map normalized coord -> (lo index, hi index, frac) with clamp addressing."""
    x = u * n - 0.5
    x0 = jnp.floor(x)
    f = x - x0
    base = x0.astype(jnp.int32)
    i0 = jnp.clip(base, 0, n - 1)
    i1 = jnp.clip(base + 1, 0, n - 1)
    return i0, i1, f.astype(jnp.float32)


def sample_trilinear(volume, uvw):
    """Trilinear sample: volume (D, H, W, C), uvw (..., 3) in [0,1] -> (..., C)."""
    d, h, w = volume.shape[0], volume.shape[1], volume.shape[2]
    x0, x1, fx = _axis_coords(uvw[..., 0], w)
    y0, y1, fy = _axis_coords(uvw[..., 1], h)
    z0, z1, fz = _axis_coords(uvw[..., 2], d)

    def tap(zi, yi, xi):
        return volume[zi, yi, xi]

    fx = fx[..., None]
    fy = fy[..., None]
    fz = fz[..., None]
    c00 = tap(z0, y0, x0) * (1 - fx) + tap(z0, y0, x1) * fx
    c01 = tap(z0, y1, x0) * (1 - fx) + tap(z0, y1, x1) * fx
    c10 = tap(z1, y0, x0) * (1 - fx) + tap(z1, y0, x1) * fx
    c11 = tap(z1, y1, x0) * (1 - fx) + tap(z1, y1, x1) * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def sample_bilinear(tex, uv):
    """Bilinear sample: tex (H, W[, C]), uv (..., 2) in [0,1]."""
    squeeze = tex.ndim == 2
    if squeeze:
        tex = tex[..., None]
    h, w = tex.shape[0], tex.shape[1]
    x0, x1, fx = _axis_coords(uv[..., 0], w)
    y0, y1, fy = _axis_coords(uv[..., 1], h)
    fx = fx[..., None]
    fy = fy[..., None]
    c0 = tex[y0, x0] * (1 - fx) + tex[y0, x1] * fx
    c1 = tex[y1, x0] * (1 - fx) + tex[y1, x1] * fx
    out = c0 * (1 - fy) + c1 * fy
    return out[..., 0] if squeeze else out


def sample_point(tex, uv):
    """Point (nearest) sample: tex (H, W[, C]), uv (..., 2) in [0,1]."""
    h, w = tex.shape[0], tex.shape[1]
    xi = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return tex[yi, xi]


def indexed_trilinear(stack, idx, uvw):
    """Trilinear sample from a stack of volumes with a per-ray index.

    stack: (N, D, H, W, C); idx: (...,) int32; uvw: (..., 3) -> (..., C).
    Pointwise gather — never materializes per-ray volume copies. This is
    the TPU stand-in for the reference's bindless `g_txGrids[]` /
    `g_txLightMaps[]` descriptor arrays (`RayMarch.hlsli:23-24`).
    """
    d, h, w = stack.shape[1:4]
    x = uvw[..., 0] * w - 0.5
    y = uvw[..., 1] * h - 0.5
    z = uvw[..., 2] * d - 0.5
    x0f, y0f, z0f = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = (x - x0f)[..., None], (y - y0f)[..., None], (z - z0f)[..., None]

    def cidx(v, nn):
        return jnp.clip(v.astype(jnp.int32), 0, nn - 1)

    x0, x1 = cidx(x0f, w), cidx(x0f + 1, w)
    y0, y1 = cidx(y0f, h), cidx(y0f + 1, h)
    z0, z1 = cidx(z0f, d), cidx(z0f + 1, d)

    def tap(zi, yi, xi):
        return stack[idx, zi, yi, xi]

    c00 = tap(z0, y0, x0) * (1 - fx) + tap(z0, y0, x1) * fx
    c01 = tap(z0, y1, x0) * (1 - fx) + tap(z0, y1, x1) * fx
    c10 = tap(z1, y0, x0) * (1 - fx) + tap(z1, y0, x1) * fx
    c11 = tap(z1, y1, x0) * (1 - fx) + tap(z1, y1, x1) * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def indexed_trilinear_soa(stack, idx, u, v, w):
    """Structure-of-arrays trilinear sample: returns a tuple of C arrays.

    stack: (N, D, H, W, C); idx, u, v, w: (...,) -> C x (...,).

    TPU-native variant of `indexed_trilinear`: every input and output is a
    scalar field over the ray batch, so no array ever carries a tiny
    channel dim in its minor axes (TPU tiling pads trailing dims of 3/4 to
    128 lanes — a 32x memory blowup inside loop bodies).
    """
    d, h, ww = stack.shape[1:4]
    c = stack.shape[-1]
    x = u * ww - 0.5
    y = v * h - 0.5
    z = w * d - 0.5
    x0f, y0f, z0f = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = x - x0f, y - y0f, z - z0f

    def cidx(vv, nn):
        return jnp.clip(vv.astype(jnp.int32), 0, nn - 1)

    x0, x1 = cidx(x0f, ww), cidx(x0f + 1, ww)
    y0, y1 = cidx(y0f, h), cidx(y0f + 1, h)
    z0, z1 = cidx(z0f, d), cidx(z0f + 1, d)

    outs = []
    for ci in range(c):
        ch = stack[..., ci]

        def tap(zi, yi, xi):
            return ch[idx, zi, yi, xi]

        c00 = tap(z0, y0, x0) * (1 - fx) + tap(z0, y0, x1) * fx
        c01 = tap(z0, y1, x0) * (1 - fx) + tap(z0, y1, x1) * fx
        c10 = tap(z1, y0, x0) * (1 - fx) + tap(z1, y0, x1) * fx
        c11 = tap(z1, y1, x0) * (1 - fx) + tap(z1, y1, x1) * fx
        c0 = c00 * (1 - fy) + c01 * fy
        c1 = c10 * (1 - fy) + c11 * fy
        outs.append(c0 * (1 - fz) + c1 * fz)
    return tuple(outs)


def gather4_bilinear(tex, uv):
    """D3D Gather semantics: the 4 texels a bilinear tap would read.

    tex (H, W[, C]), uv (..., 2) -> (..., 4[, C]) in Gather component order
    (-,+),(+,+),(+,-),(-,-) texel offsets — i.e. w=(x0,y1), x=(x1,y1),
    y=(x1,y0), z=(x0,y0) ordered [w?]… D3D returns (x=lower-left of the
    quad's CCW order): here we return [(x0,y1),(x1,y1),(x1,y0),(x0,y0)]
    matching GatherRed's (v0=top-left-origin) component layout used by
    `PSCube.hlsli:60-66`.
    """
    squeeze = tex.ndim == 2
    if squeeze:
        tex = tex[..., None]
    h, w = tex.shape[0], tex.shape[1]
    x0, x1, _ = _axis_coords(uv[..., 0], w)
    y0, y1, _ = _axis_coords(uv[..., 1], h)
    g = jnp.stack(
        [tex[y1, x0], tex[y1, x1], tex[y0, x1], tex[y0, x0]], axis=-2
    )
    return g[..., 0] if squeeze else g
