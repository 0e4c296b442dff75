"""Fused temporal-AA resolve as one Pallas kernel.

Semantics twin: `render/taa.py` (itself a port of `CSTemporalAA.hlsl:
254-336`). The jnp formulation lowers to ~100 separate XLA ops on TPU —
each 3x3 neighborhood shift materializes through HBM, and the pass is
dispatch-bound (~150 ms at 1280x800 on a v5e). Here the whole resolve
(neighborhood stats, variance AABB, history clamp, anti-flicker blend,
NaN guard) runs tile-resident in VMEM over row bands: one kernel, one
HBM round trip. The row halo is fed as three row-shifted views of the
current frame (Pallas blocks cannot overlap); column taps clamp-shift
inside the band.

The history *reprojection* (a true bilinear gather when the frame has
mesh velocity) stays outside: callers pass the already-reprojected
history plus the `cur_history_blur` field. With no velocity (the
reference's volumes never write velocity, `PSBasePass.hlsl:107-109`)
both reduce to the raw history and zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multivolumes_tpu.ops.pallas import interpret_default

_HISTORY_MAX = 15.0  # (1 << 4) - 1, `CSTemporalAA.hlsl:41-43`
_ALPHA_BOUND = 1.0   # vcxproj override

# tap offsets (`g_texOffsets`): 4 cross then 4 diagonal
_OFFSETS = [(-1, 0), (1, 0), (0, -1), (0, 1),
            (-1, -1), (1, -1), (1, 1), (-1, 1)]
_WEIGHTS = [0.5, 0.5, 0.5, 0.5, 0.25, 0.25, 0.25, 0.25]

_TH = 16  # band height (sublane-aligned; small enough that 6 double-buffered
# (4, _TH, W) f32 blocks + kernel temps fit the ~16 MB VMEM at W=1280)


def _rgb_to_ycocg(r, g, b):
    return (r + 2.0 * g + b, 2.0 * r - 2.0 * b, -r + 2.0 * g - b)


def _ycocg_to_rgb(y, co, cg):
    y, co, cg = y * 0.25, co * 0.25, cg * 0.25
    return (y + co - cg, y + cg, y - co - cg)


def _tm(r, g, b):
    y, co, cg = _rgb_to_ycocg(r, g, b)
    inv = 1.0 / (4.0 + y)
    return y * inv, co * inv, cg * inv


def _itm(y, co, cg):
    s = 4.0 / (1.0 - y)
    return _ycocg_to_rgb(y * s, co * s, cg * s)


def _shift_x(band, dx: int):
    """band (..., W): out[..., x] = band[..., x + dx], edge clamp."""
    if dx == 0:
        return band
    if dx > 0:
        return jnp.concatenate(
            [band[..., dx:]] + [band[..., -1:]] * dx, axis=-1)
    return jnp.concatenate(
        [band[..., :1]] * (-dx) + [band[..., :dx]], axis=-1)


def _taa_band_kernel(cm_ref, c0_ref, cp_ref, hist_ref, blur_ref, out_ref,
                     img_ref=None):
    """cm/c0/cp: (4, TH, W) current rgba rows shifted by dy=-1/0/+1;
    hist_ref: (4, TH, W) reprojected history; blur_ref: (1, TH, W);
    out_ref: (4, TH, W) new history (channels 0..2 = resolved color);
    img_ref (optional): (3, TH, W) DISPLAY image — the tone-map curve
    (`PSToneMap.hlsl:19-28`, postprocess.tone_map_ch) applied to the
    resolved color in-band, so the planar frame tail needs no separate
    full-screen tonemap + stack kernels."""
    rows = {-1: cm_ref, 0: c0_ref, 1: cp_ref}

    def tap(c, dy):
        return rows[dy][c]

    cr, cg_, cb, ca = tap(0, 0), tap(1, 0), tap(2, 0), tap(3, 0)
    cur_history_blur = blur_ref[0]
    h0, h1, h2, h3 = hist_ref[0], hist_ref[1], hist_ref[2], hist_ref[3]

    history_blur = jnp.maximum(1.0 - h3, cur_history_blur)
    hist_w = h3 * _HISTORY_MAX + 1.0

    cy, cco, ccg = _tm(cr, cg_, cb)
    cur_a = jnp.where(ca < _ALPHA_BOUND, 0.0, 1.0)
    gamma = jnp.where((history_blur > 0.0) | (ca < _ALPHA_BOUND), 1.0, 16.0)

    # NeighborMinMax (`CSTemporalAA.hlsl:166-236`)
    m1 = [cy, cco, ccg]
    m2 = [cy * cy, cco * cco, ccg * ccg]
    filt = [cy, cco, ccg]
    filt_a = cur_a
    for (dx, dy), wt in zip(_OFFSETS, _WEIGHTS):
        nr = _shift_x(tap(0, dy), dx)
        ng = _shift_x(tap(1, dy), dx)
        nb = _shift_x(tap(2, dy), dx)
        na = _shift_x(tap(3, dy), dx)
        ny, nco, ncg = _tm(nr, ng, nb)
        na = jnp.where(na < _ALPHA_BOUND, 0.0, 1.0)
        for ci, nv in enumerate((ny, nco, ncg)):
            filt[ci] = filt[ci] + nv * wt
            m1[ci] = m1[ci] + nv
            m2[ci] = m2[ci] + nv * nv
        filt_a = filt_a + na * wt
    filt = [f * 0.25 for f in filt]
    filt_a = filt_a * 0.25

    mu = [m * (1.0 / 9.0) for m in m1]
    sigma = [jnp.sqrt(jnp.abs(m2[c] * (1.0 / 9.0) - mu[c] * mu[c]))
             for c in range(3)]
    n_min = [jnp.minimum(mu[c] - gamma * sigma[c], filt[c]) for c in range(3)]
    n_max = [jnp.maximum(mu[c] + gamma * sigma[c], filt[c]) for c in range(3)]
    n_min_w = mu[0] - sigma[0]
    n_max_w = mu[0] + sigma[0]

    cur_history_blur = jnp.clip(cur_history_blur, 0.0, 1.0)
    history_blur = jnp.clip(history_blur, 0.0, 1.0)

    hy, hco, hcg = _tm(h0, h1, h2)
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
    filt = [filt[c] + (cur_tm[c] - filt[c]) * add_alias for c in range(3)]

    lum_hist = hist_tm[0]
    dist_to_clamp = jnp.minimum(
        jnp.abs(n_min_w - lum_hist), jnp.abs(n_max_w - lum_hist)
    )
    history_amt = jnp.minimum(1.0 / hist_w + history_blur * 0.125, 1.0)
    blend = 0.25 / (8.0 + (dist_to_clamp + contrast - 8.0) * history_amt)
    blend = jnp.minimum(blend, 0.25)
    blend = jnp.where(filt_a > 0.0, blend, 1.0)

    mixed = [hist_tm[c] + (filt[c] - hist_tm[c]) * blend for c in range(3)]
    rr, rg, rb = _itm(*mixed)
    fr, fg, fb = _itm(*filt)
    bad = jnp.isnan(rr) | jnp.isnan(rg) | jnp.isnan(rb)
    rr = jnp.where(bad, fr, rr)
    rg = jnp.where(bad, fg, rg)
    rb = jnp.where(bad, fb, rb)

    meta = jnp.minimum(hist_w * (1.0 / _HISTORY_MAX), 1.0 - cur_history_blur)
    out_ref[0] = rr
    out_ref[1] = rg
    out_ref[2] = rb
    out_ref[3] = meta
    if img_ref is not None:
        def tmap(x):
            x = x * 1.05 / (x + 0.7)
            return jnp.power(jnp.abs(x), 1.25)

        img_ref[0] = tmap(rr)
        img_ref[1] = tmap(rg)
        img_ref[2] = tmap(rb)


def _pad_views(cur, hist, blur, h_mult: int):
    """Edge-pad to (h_mult-multiple rows, 128-multiple lanes) and build
    the dy = -1/0/+1 row-shifted views of the current frame (the row
    halo — Pallas blocks cannot overlap)."""
    _, h, w = cur.shape
    wp = -(-w // 128) * 128
    hp = -(-h // h_mult) * h_mult
    # edge padding keeps the clamp-shift taps exact at the crop boundary
    pad_cur = jnp.pad(cur, ((0, 0), (1, 1 + hp - h), (0, wp - w)),
                      mode="edge")
    cur_m = pad_cur[:, 0:hp]          # rows shifted dy=-1
    cur_0 = pad_cur[:, 1:hp + 1]
    cur_p = pad_cur[:, 2:hp + 2]      # rows shifted dy=+1
    hist_p = jnp.pad(hist, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")
    blur_p = jnp.pad(blur[None], ((0, 0), (0, hp - h), (0, wp - w)),
                     mode="edge")
    return cur_m, cur_0, cur_p, hist_p, blur_p


def _resolve_bands(cur_m, cur_0, cur_p, hist_p, blur_p, interpret: bool,
                   tonemap: bool = False):
    """The band pallas_call on already-padded, already-shifted inputs
    ((4, HP, WP) each, HP a _TH multiple). Purely local row bands.
    tonemap=True adds a second (3, HP, WP) output: the display-mapped
    image (see _taa_band_kernel)."""
    _, hp, wp = cur_0.shape
    spec = pl.BlockSpec((4, _TH, wp), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((4, hp, wp), jnp.float32)
    out_specs = spec
    kernel = _taa_band_kernel
    if tonemap:
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((3, hp, wp), jnp.float32)]
        out_specs = [spec, pl.BlockSpec((3, _TH, wp), lambda i: (0, i, 0),
                                        memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(hp // _TH,),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((1, _TH, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        interpret=interpret,
    )(cur_m, cur_0, cur_p, hist_p, blur_p)


@functools.partial(jax.jit, static_argnames=("interpret", "tonemap"))
def taa_resolve(cur, hist, blur, interpret: bool | None = None,
                tonemap: bool = False):
    """cur (4, H, W) current rgba fields; hist (4, H, W) reprojected
    history; blur (H, W) cur_history_blur. Returns the new history
    (4, H, W) whose channels 0..2 are the resolved color — plus the
    display-mapped (3, H, W) image when tonemap=True (fused in-band,
    saving the frame tail's separate tonemap + planar-stack kernels)."""
    if interpret is None:
        interpret = interpret_default()
    cur = cur.astype(jnp.float32)
    hist = hist.astype(jnp.float32)
    blur = blur.astype(jnp.float32)
    _, h, w = cur.shape
    views = _pad_views(cur, hist, blur, _TH)
    out = _resolve_bands(*views, interpret, tonemap=tonemap)
    if tonemap:
        hist_out, img = out
        return hist_out[:, :h, :w], img[:, :h, :w]
    return out[:, :h, :w]


def taa_resolve_sharded(device_mesh, cur, hist, blur,
                        interpret: bool | None = None):
    """Row-sharded resolve for 2-D device meshes (SURVEY section 2.6's
    screen-space data-parallel axis): each device runs the band kernel on
    a contiguous band of pixel rows. The dy = +-1 row-shifted views are
    built globally BEFORE the shard_map, so the only cross-device traffic
    is GSPMD's one-row halo exchange on those views; the opaque
    pallas_call itself is partitioned by construction."""
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = interpret_default()
    rows = device_mesh.shape["rows"]
    cur = cur.astype(jnp.float32)
    hist = hist.astype(jnp.float32)
    blur = blur.astype(jnp.float32)
    _, h, w = cur.shape
    views = _pad_views(cur, hist, blur, _TH * rows)

    def local_fn(cm, c0, cp, hi, bl):
        return _resolve_bands(cm, c0, cp, hi, bl, interpret)

    row_spec = P(None, "rows", None)
    out = jax.shard_map(
        local_fn,
        mesh=device_mesh,
        in_specs=(row_spec,) * 5,
        out_specs=row_spec,
        check_vma=False,
    )(*views)
    return out[:, :h, :w]
