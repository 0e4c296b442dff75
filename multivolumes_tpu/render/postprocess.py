"""Display mapping and sky rendering.

- `tone_map`: `PSToneMap.hlsl:19-28` — x*1.05/(x+0.7) then pow 1.25.
- `render_environment`: `PSEnvironment.hlsl:46-69` (infinite-size branch):
  unproject each pixel, sample the radiance cube along the view ray,
  depth-tested LESS_EQUAL behind everything already drawn.
"""

from __future__ import annotations

import jax.numpy as jnp

from multivolumes_tpu.core import math3d
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
    n = radiance.shape[1]
    vol_id = jnp.zeros(dx.shape, jnp.int32)
    n_eff = jnp.full(dx.shape, n, jnp.int32)
    rad = jnp.moveaxis(radiance, -1, 1)[None]  # (1, 6, 3, R, R)
    low = composite.sample_cube_soa(rad, vol_id, dx, dy, dz, n_eff)
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
