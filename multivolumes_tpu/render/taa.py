"""Temporal anti-aliasing resolve.

Port of `CSTemporalAA.hlsl:254-336` with the reference's shipped configure:
`_VARIANCE_AABB_ = 1`, `_USE_YCOCG_ = 1`, `ALPHA_BOUND = 1.0`
(`MultiVolumes.vcxproj:184-185`), no `_R11G11B10_`/`_DENOISE_`/
`_ALPHA_AS_ID_`: 3x3 max-velocity dilation (diagonal taps), invertible
Reinhard tonemap into YCoCg, variance-AABB neighborhood clamping with
history-confidence gamma, anti-flicker contrast weighting, history
metadata packed in alpha (4-bit counter), NaN guard.

TPU layout: channels are separate (H, W) scalar fields throughout (SoA);
the persistent history is stored channel-leading (4, H, W). The 8x8
thread groups of the reference become shifted-array neighborhoods.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HISTORY_MAX = 15.0  # (1 << 4) - 1, `CSTemporalAA.hlsl:41-43`
_ALPHA_BOUND = 1.0   # vcxproj override

# tap offsets (`g_texOffsets`): 4 cross then 4 diagonal
_OFFSETS = [(-1, 0), (1, 0), (0, -1), (0, 1),
            (-1, -1), (1, -1), (1, 1), (-1, 1)]
_WEIGHTS = [0.5, 0.5, 0.5, 0.5, 0.25, 0.25, 0.25, 0.25]


def _shift(img, dx: int, dy: int):
    """out[y, x] = img[y + dy, x + dx], edge-clamped. img (H, W).

    Built from slices + edge repeats only: index-array shifts lower to
    per-element gathers on TPU (~65 Mtaps/s), which made the 3x3
    neighborhood reads the dominant TAA cost."""

    def roll(x, d, axis):
        if d == 0:
            return x
        take = [slice(None)] * x.ndim
        edge = [slice(None)] * x.ndim
        if d > 0:
            take[axis] = slice(d, None)
            edge[axis] = slice(-1, None)
            parts = [x[tuple(take)]] + [x[tuple(edge)]] * d
        else:
            take[axis] = slice(None, d)
            edge[axis] = slice(None, 1)
            parts = [x[tuple(edge)]] * (-d) + [x[tuple(take)]]
        return jnp.concatenate(parts, axis=axis)

    return roll(roll(img, dy, img.ndim - 2), dx, img.ndim - 1)


def rgb_to_ycocg(r, g, b):
    return (r + 2.0 * g + b, 2.0 * r - 2.0 * b, -r + 2.0 * g - b)


def ycocg_to_rgb(y, co, cg):
    y, co, cg = y * 0.25, co * 0.25, cg * 0.25
    return (y + co - cg, y + cg, y - co - cg)


def tm(r, g, b):
    """Invertible Reinhard in YCoCg (`TM`, `CSTemporalAA.hlsl:106-114`)."""
    y, co, cg = rgb_to_ycocg(r, g, b)
    inv = 1.0 / (4.0 + y)
    return y * inv, co * inv, cg * inv


def itm(y, co, cg):
    """Inverse (`ITM`, `CSTemporalAA.hlsl:119-128`)."""
    s = 4.0 / (1.0 - y)
    return ycocg_to_rgb(y * s, co * s, cg * s)


def velocity_max(vx, vy):
    """Center + 4 diagonal taps, keep the fastest (`VelocityMax`,
    `CSTemporalAA.hlsl:133-161`)."""
    best_x, best_y = vx, vy
    best_sq = vx * vx + vy * vy
    for dx, dy in _OFFSETS[4:]:
        nx_ = _shift(vx, dx, dy)
        ny_ = _shift(vy, dx, dy)
        sq = nx_ * nx_ + ny_ * ny_
        take = sq > best_sq
        best_x = jnp.where(take, nx_, best_x)
        best_y = jnp.where(take, ny_, best_y)
        best_sq = jnp.maximum(sq, best_sq)
    return best_x, best_y


def _bilinear_rows16(history, ub, vb, h, w):
    """All four bilinear corners of the 4-channel history in ONE row
    gather per pixel.

    Build: edge-pad to (h+1, w+1, 4), flatten to rows of 4, then
    lane-CONCAT four row-shifted views into a (R, 16) table — row r
    holds [c00, c01, c10, c11] for base pixel r. The shifts are row-axis
    slices (sublane-cheap, ~0.1 ms at 1280x800); no stride-2
    deinterleave (the ~70 ms/Mpx shape) is involved. The tap is then
    one contiguous-row gather (~5.6 ms/M rows) instead of four
    (the four-corner form measured 5.9 ms/frame at a 512 px window).
    """
    x = ub * w - 0.5
    y = vb * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    # below-zero bases clamp BOTH corners to texel 0 (matching the
    # clipped-corner formulation): zero the fraction there
    fx = jnp.where(x0f < 0, 0.0, x - x0f)[..., None]
    fy = jnp.where(y0f < 0, 0.0, y - y0f)[..., None]
    xi0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    yi0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)

    img = jnp.moveaxis(history, 0, -1)                   # (h, w, 4)
    pad = jnp.pad(img, ((0, 1), (0, 1), (0, 0)), mode="edge")
    flat = pad.reshape((h + 1) * (w + 1), 4)
    wp = w + 1
    table = jnp.concatenate(
        [flat[: -wp - 1], flat[1: -wp], flat[wp: -1], flat[wp + 1:]],
        axis=1)                                          # (R, 16)
    row = table[yi0 * wp + xi0]                          # (..., 16)
    return ((row[..., 0:4] * (1 - fx) + row[..., 4:8] * fx) * (1 - fy)
            + (row[..., 8:12] * (1 - fx) + row[..., 12:16] * fx) * fy)


def _sample_bilinear_ch(img, u, v):
    """img (H, W), u/v (H, W) normalized -> (H, W). Linear clamp."""
    h, w = img.shape
    x = u * w - 0.5
    y = v * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx, fy = x - x0f, y - y0f

    def cidx(vv, nn):
        return jnp.clip(vv.astype(jnp.int32), 0, nn - 1)

    x0, x1 = cidx(x0f, w), cidx(x0f + 1, w)
    y0, y1 = cidx(y0f, h), cidx(y0f + 1, h)
    c0 = img[y0, x0] * (1 - fx) + img[y0, x1] * fx
    c1 = img[y1, x0] * (1 - fx) + img[y1, x1] * fx
    return c0 * (1 - fy) + c1 * fy


def temporal_aa(current, history, velocity, use_pallas: bool = True,
                reproj_center=None, reproj_window: int = 0,
                device_mesh=None, tonemap_out: bool = False):
    """current: (r, g, b, a) scalar fields ((H, W) each; a <= 0.9997 marks
    transparency); history: (4, H, W) channel-leading previous output +
    metadata; velocity: (vx, vy) fields, or None when the frame has no
    velocity writers (no mesh — the reference's volumes never write
    velocity, `PSBasePass.hlsl:107-109`): the history reprojection is then
    the identity and the 16M-tap bilinear gather is statically skipped.
    Returns ((r, g, b) resolved, new history (4, H, W)).

    The production path fuses the whole resolve into one Pallas kernel
    (`ops/pallas/taa_kernel.py`); only the velocity-dilated history
    reprojection (a genuine bilinear gather) stays in XLA. This jnp body
    is the semantics twin, kept for goldens (use_pallas=False).

    tonemap_out=True (Pallas single-device path only) additionally
    returns the display-mapped PLANAR (3, H, W) image as a third
    element, tone-mapped inside the resolve kernel — the throughput
    frame tail then needs no separate tonemap/stack kernels."""
    if use_pallas:
        return _temporal_aa_pallas(current, history, velocity,
                                   reproj_center, reproj_window,
                                   device_mesh, tonemap_out=tonemap_out)
    assert not tonemap_out, "tonemap_out is a Pallas-path contract"
    return _temporal_aa_jnp(current, history, velocity)


def _temporal_aa_pallas(current, history, velocity, reproj_center=None,
                        reproj_window: int = 0, device_mesh=None,
                        tonemap_out: bool = False):
    from multivolumes_tpu.ops.pallas import taa_kernel

    cr, cg_, cb, ca = current
    h, w = cr.shape
    use_window = (velocity is not None and reproj_center is not None
                  and 0 < reproj_window < min(h, w))
    if velocity is None:
        hist = history
        blur = jnp.zeros_like(cr)
    elif use_window:
        # Velocity is written only by mesh pixels (`PSBasePass.hlsl:
        # 107-109`); outside the mesh's screen window the reprojection is
        # the identity. Restrict the 16-taps-per-pixel bilinear gather to
        # a static window around the mesh — everything else reuses the
        # history untouched. Content outside the window (a mesh larger
        # than reproj_window) falls back to unreprojected history there.
        win = reproj_window
        cx, cy = reproj_center
        x0 = jnp.clip(jnp.round(cx - win * 0.5), 0, w - win).astype(jnp.int32)
        y0 = jnp.clip(jnp.round(cy - win * 0.5), 0, h - win).astype(jnp.int32)
        vx = jax.lax.dynamic_slice(velocity[0], (y0, x0), (win, win))
        vy = jax.lax.dynamic_slice(velocity[1], (y0, x0), (win, win))
        mvx, mvy = velocity_max(vx, vy)
        xs = (jnp.arange(win, dtype=jnp.float32) + 0.5 +
              x0.astype(jnp.float32)) / w
        ys = (jnp.arange(win, dtype=jnp.float32) + 0.5 +
              y0.astype(jnp.float32)) / h
        ug, vg = jnp.meshgrid(xs, ys, indexing="xy")
        ub, vb = ug - mvx, vg - mvy
        # one quad-row gather per pixel (see _bilinear_rows16)
        hist_w = _bilinear_rows16(history, ub, vb, h, w)  # (win, win, 4)
        hist = jax.lax.dynamic_update_slice(
            history, jnp.moveaxis(hist_w, -1, 0), (0, y0, x0))
        blur_w = jnp.abs(mvx) * (4.0 * w) + jnp.abs(mvy) * (4.0 * h)
        blur = jax.lax.dynamic_update_slice(
            jnp.zeros_like(cr), blur_w, (y0, x0))
    else:
        # full-screen reprojection (reproj_window == 0, or no centre):
        # same quad-row gather as the windowed path — the per-channel
        # element-gather formulation measured ~167 ms/frame at 1280x800
        vx, vy = velocity
        mvx, mvy = velocity_max(vx, vy)
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        ug, vg = jnp.meshgrid(xs, ys, indexing="xy")
        ub, vb = ug - mvx, vg - mvy
        hist4 = _bilinear_rows16(history, ub, vb, h, w)   # (H, W, 4)
        hist = jnp.moveaxis(hist4, -1, 0)
        blur = jnp.abs(mvx) * (4.0 * w) + jnp.abs(mvy) * (4.0 * h)

    cur = jnp.stack([cr, cg_, cb, ca], 0)
    if device_mesh is not None and "rows" in device_mesh.axis_names:
        # 2-D device mesh: band-resolve a contiguous row band per device
        assert not tonemap_out, "fused tonemap is single-device only"
        new_history = taa_kernel.taa_resolve_sharded(
            device_mesh, cur, hist, blur)
    elif tonemap_out:
        new_history, img = taa_kernel.taa_resolve(cur, hist, blur,
                                                  tonemap=True)
        return ((new_history[0], new_history[1], new_history[2]),
                new_history, img)
    else:
        new_history = taa_kernel.taa_resolve(cur, hist, blur)
    return (new_history[0], new_history[1], new_history[2]), new_history


def _temporal_aa_jnp(current, history, velocity):
    cr, cg_, cb, ca = current
    h, w = cr.shape

    if velocity is None:
        hist = [history[c] for c in range(4)]
        cur_history_blur = jnp.zeros_like(cr)
    else:
        vx, vy = velocity
        mvx, mvy = velocity_max(vx, vy)
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        ug, vg = jnp.meshgrid(xs, ys, indexing="xy")
        ub, vb = ug - mvx, vg - mvy
        hist = [_sample_bilinear_ch(history[c], ub, vb) for c in range(4)]

        blur_x = jnp.abs(mvx) * (4.0 * w)
        blur_y = jnp.abs(mvy) * (4.0 * h)
        cur_history_blur = blur_x + blur_y

    history_blur = jnp.maximum(1.0 - hist[3], cur_history_blur)
    hist_w = hist[3] * _HISTORY_MAX + 1.0

    cy, cco, ccg = tm(cr, cg_, cb)
    cur_a = jnp.where(ca < _ALPHA_BOUND, 0.0, 1.0)
    gamma = jnp.where((history_blur > 0.0) | (ca < _ALPHA_BOUND), 1.0, 16.0)

    # NeighborMinMax (`CSTemporalAA.hlsl:166-236`)
    m1 = [cy, cco, ccg]
    m2 = [cy * cy, cco * cco, ccg * ccg]
    filt = [cy, cco, ccg]
    filt_a = cur_a
    for (dx, dy), wt in zip(_OFFSETS, _WEIGHTS):
        nr = _shift(cr, dx, dy)
        ng = _shift(cg_, dx, dy)
        nb = _shift(cb, dx, dy)
        na = _shift(ca, dx, dy)
        ny, nco, ncg = tm(nr, ng, nb)
        na = jnp.where(na < _ALPHA_BOUND, 0.0, 1.0)
        for ci, nv in enumerate((ny, nco, ncg)):
            filt[ci] = filt[ci] + nv * wt
            m1[ci] = m1[ci] + nv
            m2[ci] = m2[ci] + nv * nv
        filt_a = filt_a + na * wt
    filt = [f / 4.0 for f in filt]
    filt_a = filt_a / 4.0

    mu = [m / 9.0 for m in m1]
    sigma = [jnp.sqrt(jnp.abs(m2[c] / 9.0 - mu[c] * mu[c])) for c in range(3)]
    n_min = [jnp.minimum(mu[c] - gamma * sigma[c], filt[c]) for c in range(3)]
    n_max = [jnp.maximum(mu[c] + gamma * sigma[c], filt[c]) for c in range(3)]
    n_min_w = mu[0] - sigma[0]
    n_max_w = mu[0] + sigma[0]

    cur_history_blur = jnp.clip(cur_history_blur, 0.0, 1.0)
    history_blur = jnp.clip(history_blur, 0.0, 1.0)

    hy, hco, hcg = tm(hist[0], hist[1], hist[2])
    hist_tm = [
        jnp.clip(v, n_min[c], n_max[c])
        for c, v in enumerate((hy, hco, hcg))
    ]
    contrast = n_max_w - n_min_w

    lum_contrast_factor = 32.0 * 4.0
    add_alias = history_blur * 0.5 + 0.25
    add_alias = jnp.clip(
        add_alias + 1.0 / (1.0 + contrast * lum_contrast_factor), 0.0, 1.0
    )
    cur_tm = (cy, cco, ccg)
    filt = [
        filt[c] + (cur_tm[c] - filt[c]) * add_alias for c in range(3)
    ]

    lum_hist = hist_tm[0]
    dist_to_clamp = jnp.minimum(
        jnp.abs(n_min_w - lum_hist), jnp.abs(n_max_w - lum_hist)
    )
    history_amt = jnp.minimum(1.0 / hist_w + history_blur / 8.0, 1.0)
    blend = 0.25 / (8.0 + (dist_to_clamp + contrast - 8.0) * history_amt)
    blend = jnp.minimum(blend, 0.25)
    blend = jnp.where(filt_a > 0.0, blend, 1.0)

    mixed = [hist_tm[c] + (filt[c] - hist_tm[c]) * blend for c in range(3)]
    rr, rg, rb = itm(*mixed)
    fr, fg, fb = itm(*filt)
    bad = jnp.isnan(rr) | jnp.isnan(rg) | jnp.isnan(rb)
    rr = jnp.where(bad, fr, rr)
    rg = jnp.where(bad, fg, rg)
    rb = jnp.where(bad, fb, rb)

    meta = jnp.minimum(hist_w / _HISTORY_MAX, 1.0 - cur_history_blur)
    new_history = jnp.stack([rr, rg, rb, meta], 0)
    return (rr, rg, rb), new_history
