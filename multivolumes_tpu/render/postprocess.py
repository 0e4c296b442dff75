"""Display mapping and sky rendering.

- `tone_map`: `PSToneMap.hlsl:19-28` — x*1.05/(x+0.7) then pow 1.25.
- `render_environment`: `PSEnvironment.hlsl:46-69` (infinite-size branch):
  unproject each pixel, sample the radiance cube along the view ray,
  depth-tested LESS_EQUAL behind everything already drawn.
"""

from __future__ import annotations

import jax.numpy as jnp

from multivolumes_tpu.render import composite


def tone_map(color):
    """(..., 3+) linear HDR -> display color in [0,1]."""
    c = color[..., :3]
    c = c * 1.05 / (c + 0.7)
    c = jnp.power(jnp.abs(c), 1.25)
    return c


def tone_map_ch(r, g, b):
    """Per-channel-field variant of `tone_map` (SoA hot path)."""

    def f(x):
        x = x * 1.05 / (x + 0.7)
        return jnp.power(jnp.abs(x), 1.25)

    return f(r), f(g), f(b)


def _upsample_matrix(n_out: int, n_in: int):
    """(n_out, n_in) bilinear upsample matrix (texel-center aligned)."""
    import jax

    rows = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 1)
    src = jnp.clip((rows + 0.5) * (n_in / n_out) - 0.5, 0.0, n_in - 1.0)
    return jnp.maximum(1.0 - jnp.abs(src - cols), 0.0)


def _sample_cube_rows12(radiance, dx, dy, dz):
    """Full-res bilinear cube sample as ONE 12-float row gather per ray.

    The 12 per-ray element gathers of `composite.sample_cube_soa`
    (3 channels x 4 corners) measured ~1.9 ms/frame for the sky alone;
    the TAA quad-table trick applies verbatim: edge-pad each face,
    flatten to (rows, 3), lane-concat four row-shifted views into
    (rows, 12), then one contiguous-row gather fetches all corners.
    The table build is a few hundred KB of elementwise work per frame.
    Exactly matches sample_cube_soa at n_eff == full resolution."""
    n = radiance.shape[1]
    face, u, v = composite.dir_to_face_uv_soa(dx, dy, dz)
    x = u * n - 0.5
    y = v * n - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx = jnp.where(x0f < 0, 0.0, x - x0f)[..., None]
    fy = jnp.where(y0f < 0, 0.0, y - y0f)[..., None]
    xi = jnp.clip(x0f.astype(jnp.int32), 0, n - 1)
    yi = jnp.clip(y0f.astype(jnp.int32), 0, n - 1)

    pad = jnp.pad(radiance.astype(jnp.float32),
                  ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    wp = n + 1
    flat = pad.reshape(6 * wp * wp, 3)
    table = jnp.concatenate(
        [flat[: -wp - 1], flat[1: -wp], flat[wp: -1], flat[wp + 1:]],
        axis=1)                                          # (rows, 12)
    r = table[face * (wp * wp) + yi * wp + xi]
    out = ((r[..., 0:3] * (1 - fx) + r[..., 3:6] * fx) * (1 - fy)
           + (r[..., 6:9] * (1 - fx) + r[..., 9:12] * fx) * fy)
    return out[..., 0], out[..., 1], out[..., 2]


def render_environment(radiance, screen_to_world, eye, width: int, height: int,
                       scale: int = 2):
    """Sky color for every pixel: (6, R, R, 3) cube -> 3 x (H, W) fields.

    Sampled at 1/scale resolution (the sky is low-frequency; per-pixel
    cube taps are gather-bound) and upsampled with two separable matmuls.
    The effective scale is clamped so the low-res pass keeps >= ~160
    columns: deep divisors only make sense on large viewports.
    """
    scale = min(scale, max(1, width // 160))
    while scale > 1 and (width % scale or height % scale):
        scale -= 1
    if scale > 1:
        wl, hl = width // scale, height // scale
    else:
        wl, hl = width, height
    _xy, (dx, dy, dz) = composite.screen_rays(wl, hl, screen_to_world, eye)
    low = _sample_cube_rows12(radiance, dx, dy, dz)
    if (wl, hl) == (width, height):
        return low
    mu = _upsample_matrix(width, wl)
    mv = _upsample_matrix(height, hl)
    return tuple(mv @ c @ mu.T for c in low)


def srgb_encode(c):
    """Linear -> sRGB for PNG output (the reference presents to an
    R8G8B8A8_UNORM swap chain; we encode explicitly)."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, 12.92 * c, 1.055 * jnp.power(c, 1 / 2.4) - 0.055)
