"""Temporal anti-aliasing resolve.

Port of `CSTemporalAA.hlsl:254-336` with the reference's shipped configure:
`_VARIANCE_AABB_ = 1`, `_USE_YCOCG_ = 1`, `ALPHA_BOUND = 1.0`
(`MultiVolumes.vcxproj:184-185`), no `_R11G11B10_`/`_DENOISE_`/
`_ALPHA_AS_ID_`: 3x3 max-velocity dilation (diagonal taps), invertible
Reinhard tonemap into YCoCg, variance-AABB neighborhood clamping with
history-confidence gamma, anti-flicker contrast weighting, history
metadata packed in alpha (4-bit counter), NaN guard.

One vectorized pass over the full image (the 8x8 thread groups become
shifted-array neighborhoods).
"""

from __future__ import annotations

import jax.numpy as jnp

from multivolumes_tpu.ops import trilinear

_HISTORY_MAX = 15.0  # (1 << 4) - 1, `CSTemporalAA.hlsl:41-43`
_ALPHA_BOUND = 1.0   # vcxproj override

# tap offsets (`g_texOffsets`): 4 cross then 4 diagonal
_OFFSETS = [(-1, 0), (1, 0), (0, -1), (0, 1),
            (-1, -1), (1, -1), (1, 1), (-1, 1)]
_WEIGHTS = [0.5, 0.5, 0.5, 0.5, 0.25, 0.25, 0.25, 0.25]


def _shift(img, dx: int, dy: int):
    """img shifted so that out[y, x] = img[y + dy, x + dx], edge-clamped."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


def rgb_to_ycocg(rgb):
    y = rgb[..., 0] + 2.0 * rgb[..., 1] + rgb[..., 2]
    co = 2.0 * rgb[..., 0] - 2.0 * rgb[..., 2]
    cg = -rgb[..., 0] + 2.0 * rgb[..., 1] - rgb[..., 2]
    return jnp.stack([y, co, cg], -1)


def ycocg_to_rgb(c):
    y, co, cg = c[..., 0] * 0.25, c[..., 1] * 0.25, c[..., 2] * 0.25
    return jnp.stack([y + co - cg, y + cg, y - co - cg], -1)


def tm(hdr):
    """Invertible Reinhard in YCoCg (`TM`, `CSTemporalAA.hlsl:106-114`)."""
    c = rgb_to_ycocg(hdr)
    return c / (4.0 + c[..., 0:1])


def itm(c):
    """Inverse (`ITM`, `CSTemporalAA.hlsl:119-128`)."""
    c = c * (4.0 / (1.0 - c[..., 0:1]))
    return ycocg_to_rgb(c)


def velocity_max(velocity):
    """Center + 4 diagonal taps, keep the fastest (`VelocityMax`,
    `CSTemporalAA.hlsl:133-161`)."""
    best = velocity
    best_sq = jnp.sum(velocity * velocity, -1)
    for dx, dy in _OFFSETS[4:]:
        nb = _shift(velocity, dx, dy)
        sq = jnp.sum(nb * nb, -1)
        take = sq > best_sq
        best = jnp.where(take[..., None], nb, best)
        best_sq = jnp.maximum(sq, best_sq)
    return best


def temporal_aa(current, history, velocity):
    """current: (H, W, 4) scene color (alpha <= 0.9997 marks transparency);
    history: (H, W, 4) previous output + metadata; velocity: (H, W, 2).
    Returns (resolved (H, W, 4), new_history (H, W, 4))."""
    h, w = current.shape[0], current.shape[1]
    tex_size = jnp.array([w, h], jnp.float32)

    vel = velocity_max(velocity)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    ug, vg = jnp.meshgrid(xs, ys, indexing="xy")
    uv_back = jnp.stack([ug, vg], -1) - vel
    hist = trilinear.sample_bilinear(history, uv_back)

    history_blur_amp = 4.0 * tex_size
    blurs = jnp.abs(vel) * history_blur_amp
    cur_history_blur = blurs[..., 0] + blurs[..., 1]

    history_blur = jnp.maximum(1.0 - hist[..., 3], cur_history_blur)
    hist_w = hist[..., 3] * _HISTORY_MAX + 1.0

    cur_tm = tm(current[..., :3])
    cur_a = jnp.where(current[..., 3] < _ALPHA_BOUND, 0.0, 1.0)
    gamma = jnp.where(
        (history_blur > 0.0) | (current[..., 3] < _ALPHA_BOUND), 1.0, 16.0
    )

    # NeighborMinMax (`CSTemporalAA.hlsl:166-236`)
    m1 = cur_tm
    m2 = cur_tm * cur_tm
    filtered_rgb = cur_tm
    filtered_a = cur_a
    for (dx, dy), wt in zip(_OFFSETS, _WEIGHTS):
        nb = _shift(current, dx, dy)
        nb_tm = tm(nb[..., :3])
        nb_a = jnp.where(nb[..., 3] < _ALPHA_BOUND, 0.0, 1.0)
        filtered_rgb = filtered_rgb + nb_tm * wt
        filtered_a = filtered_a + nb_a * wt
        m1 = m1 + nb_tm
        m2 = m2 + nb_tm * nb_tm
    filtered_rgb = filtered_rgb / 4.0
    filtered_a = filtered_a / 4.0

    mu = m1 / 9.0
    sigma = jnp.sqrt(jnp.abs(m2 / 9.0 - mu * mu))
    gs = gamma[..., None] * sigma
    n_min = jnp.minimum(mu - gs, filtered_rgb)
    n_max = jnp.maximum(mu + gs, filtered_rgb)
    n_min_w = (mu - sigma)[..., 0]
    n_max_w = (mu + sigma)[..., 0]

    cur_history_blur = jnp.clip(cur_history_blur, 0.0, 1.0)
    history_blur = jnp.clip(history_blur, 0.0, 1.0)

    hist_tm = jnp.clip(tm(hist[..., :3]), n_min, n_max)
    contrast = n_max_w - n_min_w

    lum_contrast_factor = 32.0 * 4.0
    add_alias = history_blur * 0.5 + 0.25
    add_alias = jnp.clip(
        add_alias + 1.0 / (1.0 + contrast * lum_contrast_factor), 0.0, 1.0
    )
    filtered_rgb = (
        filtered_rgb + (cur_tm - filtered_rgb) * add_alias[..., None]
    )

    lum_hist = hist_tm[..., 0]
    dist_to_clamp = jnp.minimum(
        jnp.abs(n_min_w - lum_hist), jnp.abs(n_max_w - lum_hist)
    )
    history_amt = jnp.minimum(1.0 / hist_w + history_blur / 8.0, 1.0)
    blend = 0.25 / (8.0 + (dist_to_clamp + contrast - 8.0) * history_amt)
    blend = jnp.minimum(blend, 0.25)
    blend = jnp.where(filtered_a > 0.0, blend, 1.0)

    result = itm(hist_tm + (filtered_rgb - hist_tm) * blend[..., None])
    fallback = itm(filtered_rgb)
    result = jnp.where(
        jnp.any(jnp.isnan(result), -1, keepdims=True), fallback, result
    )

    meta = jnp.minimum(hist_w / _HISTORY_MAX, 1.0 - cur_history_blur)
    out = jnp.concatenate([result, meta[..., None]], -1)
    return out, out
