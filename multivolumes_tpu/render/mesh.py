"""Opaque-mesh subsystem: shadow map, depth map, shaded base pass.

TPU-rebuild of `ObjectRenderer` (`Content/ObjectRenderer.cpp`) +
`VSDepth/VSBasePass/PSBasePass`: the D3D rasterizer becomes a two-pass
scatter z-buffer plus deferred per-pixel shading —

1. *Depth pass*: every triangle emits a fixed KxK grid of coverage samples
   over its screen bbox; inside samples scatter-min quantized depth.
2. *ID pass*: samples whose depth equals the z-buffer winner scatter-min
   their triangle id.
3. *Deferred shade*: per pixel, fetch the winning triangle, recompute
   perspective-correct barycentrics at the pixel center, interpolate
   attributes, and evaluate the Blinn-Phong + Schlick-Fresnel + SH-ambient
   + Karis-env-BRDF shading of `PSBasePass.hlsl:94-153`, including the
   velocity output (current minus previous clip position) and the
   per-frame Halton jitter of `VSBasePass.hlsl:50`.

Scatter-based rasterization maps to XLA `scatter_min` (deterministic),
needs no dynamic binning, and the deferred shade runs once per pixel —
the TPU-friendly trade. Sample budget levers (backface cull, capacity,
size-tiered grids, small-triangle tail, dense analytic top) are
documented on `rasterize`; the deferred shade runs in a static window
around the projected mesh bbox (config.mesh_shade_window).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from multivolumes_tpu.config import RenderConfig, SharedConsts
from multivolumes_tpu.core import math3d, sh as sh_lib
from multivolumes_tpu.core.camera import Camera
from multivolumes_tpu.core.halton import halton_jitter

_ZQ = float(1 << 24)  # depth quantization for the uint z-buffer
# plain numpy scalar: a jnp constant here would initialize JAX backends at
# import time, locking the platform before the app can force CPU
_BIG = np.uint32(0xFFFFFFFF)


class MeshOutput(NamedTuple):
    color: tuple              # (r, g, b) scalar fields (H, W)
    valid: jnp.ndarray        # (H, W) bool — mesh covers the pixel
    velocity: tuple           # (vx, vy) scalar fields (H, W)
    depth: jnp.ndarray        # (H, W) clip z (1 = empty)
    shadow: jnp.ndarray       # (Sm, Sm) light-view clip z
    shadow_vp: jnp.ndarray    # (4, 4)
    new_prev_wvp: jnp.ndarray  # (4, 4)
    screen_center: tuple = (0.0, 0.0)  # mesh bbox centre in pixels (traced)


def _cull_capacity(num_tris: int) -> int:
    """Scatter-sample capacity under backface culling: 50% of the
    triangle count (the bunny measures a 43% front-facing max over a
    full orbit — 16% margin; back-facing rows sort to the end of the
    edge order, so slack rows emit dead samples that still pay the
    ~10 ns/update scatter). Overflow drops only the smallest
    front-facing triangles — see `rasterize`."""
    return num_tris // 2


# All-distance base-pass tier ladder: grids sized so a close-up keeps
# every tier's sample stride <= 1 px (close-up contract pinned by
# tests/test_passes.py). The far preset (below) swaps these for
# mesh-derived demo-distance grids.
NEAR_TIERS = ((2048, 10), (128, 36))


def _np_view_proj(eye, focus, width, height,
                  fov_y=SharedConsts.FOV_ANGLE_Y):
    """Host-side (numpy) look-at + perspective, matching
    core/math3d.look_at_lh / perspective_fov_lh — the raster preset
    pick must never read device data (a readback costs ~30 ms here)."""
    eye = np.asarray(eye, np.float32)
    z = np.asarray(focus, np.float32) - eye
    z = z / np.linalg.norm(z)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    view = np.zeros((4, 4), np.float32)
    view[:3, 0], view[:3, 1], view[:3, 2] = x, y, z
    view[3, :3] = [-x @ eye, -y @ eye, -z @ eye]
    view[3, 3] = 1.0
    h = 1.0 / np.tan(fov_y * 0.5)
    zn, zf = SharedConsts.Z_NEAR, SharedConsts.Z_FAR
    q = zf / (zf - zn)
    proj = np.array([[h / (width / height), 0, 0, 0], [0, h, 0, 0],
                     [0, 0, q, 1], [0, 0, -q * zn, 0]], np.float32)
    return view @ proj


def projected_size_px(aabb, eye, focus, width: int, height: int) -> float:
    """Projected screen-bbox edge (px) of a world AABB ((2, 3) min/max)
    from a host-side camera pose. Conservative: returns +inf when any
    corner is at or behind the near plane (the near preset is always
    safe). Pure numpy — usable in the per-frame host loop."""
    aabb = np.asarray(aabb, np.float32)
    corners = np.stack(np.meshgrid(*aabb.T, indexing="ij"), -1
                       ).reshape(8, 3)
    vp = _np_view_proj(eye, focus, float(width), float(height))
    hp = np.concatenate([corners, np.ones((8, 1), np.float32)], 1) @ vp
    if (hp[:, 3] <= SharedConsts.Z_NEAR * 0.5).any():
        return float("inf")
    px = (hp[:, 0] / hp[:, 3] * 0.5 + 0.5) * width
    py = (0.5 - hp[:, 1] / hp[:, 3] * 0.5) * height
    return float(max(px.max() - px.min(), py.max() - py.min()))


def derive_far_tiers(vertices, indices, mesh_world, width: int,
                     height: int, bound_px: float, dense_top: int = 16,
                     margin: float = 1.1):
    """Size a far-distance tier ladder from the mesh's own geometry.

    Host-side numpy, one-time at set_mesh. Places cameras all around the
    mesh at the distance where its projected AABB edge == bound_px, and
    takes the per-RANK max of front-facing triangle bbox edges over the
    poses (ranks = the by-edge order `rasterize` tiers on). A tier
    (count, kk) keeps sample stride <= 1 px iff every rank it covers has
    edge <= kk, so the boundaries fall out of the profile directly:
    B(kk) = first rank whose max edge <= kk (times `margin`).

    Returns (big_tiers, small_tiers) for `rasterize`:
    - big_tiers: ranks [dense_top, B(kk0-1)) at kk0 = ceil(P[dense_top]),
      then one span per INTEGER grid level down to 5 (each level kk
      serves ranks whose margined edge is in (kk-1, kk] — the sample
      count per span approaches the bbox-area bound instead of paying
      the next-coarser level's kk^2 across the whole descent).
    - small_tiers: the small end of the same profile as ABSOLUTE rank
      spans — (B(4), 3), (B(3), 2), (B(2), 1): ranks whose edge fits a
      finer grid stop paying the 4x4 base (a sub-2 px bbox emits ONE
      sample; coverage leans on bbox-overlapping neighbors exactly like
      the fixed-fraction tail did, pinned by the far-preset no-hole
      test). Ranks in [B(5), B(4)) stay on the caller's 4x4 base grid.
    Empty spans are dropped. Returns None for degenerate meshes.

    Why per-mesh: rank profiles are mesh statistics — NEAR_TIERS'
    constants were sized from the bunny's close-up profile; a far ladder
    hard-coded the same way would silently under-sample a mesh with more
    large triangles. Deriving from the actual mesh keeps the stride
    contract for any content.
    """
    v = np.asarray(vertices, np.float32)[:, :3]
    f = np.asarray(indices, np.int64)
    if f.shape[0] <= dense_top or v.shape[0] < 3:
        return None
    world = np.asarray(mesh_world, np.float32)
    vw = np.concatenate([v, np.ones((len(v), 1), np.float32)], 1) @ world
    vw = vw[:, :3]
    lo, hi = vw.min(0), vw.max(0)
    center = (lo + hi) * 0.5
    radius = float(np.linalg.norm(hi - lo)) * 0.5
    if radius <= 0.0 or bound_px <= 0.0:
        return None

    # distance where the projected AABB edge ~= bound_px (projection is
    # ~1/d at d >> radius: measure at a safe probe distance, rescale)
    d0 = radius * 8.0
    probe = projected_size_px(
        np.stack([lo, hi]), center + np.array([0.0, 0.0, -d0], np.float32),
        center, width, height)
    if not np.isfinite(probe) or probe <= 0.0:
        return None
    d = max(d0 * probe / bound_px, radius * 1.5)

    n_ranks = min(f.shape[0], 1 << 16)
    profile = np.zeros(n_ranks, np.float32)
    for elev in (-0.4, 0.0, 0.35, 0.7):
        for az in np.linspace(0.0, 2 * np.pi, 12, endpoint=False):
            ce = np.cos(elev)
            eye = center + d * np.array(
                [np.sin(az) * ce, np.sin(elev), np.cos(az) * ce],
                np.float32)
            vp = _np_view_proj(eye, center, float(width), float(height))
            hp = np.concatenate(
                [vw, np.ones((len(vw), 1), np.float32)], 1) @ vp
            w = np.maximum(hp[:, 3], 1e-6)
            px = (hp[:, 0] / w * 0.5 + 0.5) * width
            py = (0.5 - hp[:, 1] / w * 0.5) * height
            x0, y0 = px[f[:, 0]], py[f[:, 0]]
            x1, y1 = px[f[:, 1]], py[f[:, 1]]
            x2, y2 = px[f[:, 2]], py[f[:, 2]]
            area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
            ex = np.maximum(np.maximum(x0, x1), x2) \
                - np.minimum(np.minimum(x0, x1), x2)
            ey = np.maximum(np.maximum(y0, y1), y2) \
                - np.minimum(np.minimum(y0, y1), y2)
            edge = np.where(area > 0, np.maximum(ex, ey), -1.0)
            srt = np.sort(edge)[::-1][:n_ranks]
            np.maximum(profile, srt, out=profile)

    p = profile * margin

    def boundary(kk):
        """First rank whose (margined) max edge fits a kk grid at
        stride <= 1. p is non-increasing (per-pose sort + max)."""
        idx = np.nonzero(p <= kk)[0]
        return int(idx[0]) if len(idx) else n_ranks

    # grid levels, coarse to fine: the top level is whatever the first
    # post-dense_top rank needs; every integer level splits the descent
    # (level kk serves ranks with margined edge in (kk-1, kk] — grid
    # covers the bbox at stride <= 1, and the level's kk^2 budget tracks
    # the bbox area instead of paying the next-coarser level's square
    # across the whole descent). The big ladder ENDS at B(5); ranks
    # past it run the caller's 4x4 base until small_tiers takes over.
    kk0 = int(np.ceil(p[dense_top]))
    levels = sorted({kk for kk in range(5, max(kk0, 6))
                     if 4 < kk <= kk0} | ({kk0} if kk0 > 4 else set()),
                    reverse=True)
    tiers = []
    at = dense_top
    for i, kk in enumerate(levels):
        end = boundary(levels[i + 1] if i + 1 < len(levels) else 5)
        if end > at:                 # span [at, end) rasterizes at kk
            tiers.append((end, kk))
            at = end
    if not tiers:
        return None
    # the small end: absolute spans (start, kk) at AT MOST the trade
    # the fixed-fraction tail made (its 2x2 covered ranks with edges up
    # to ~4.5 px — stride <= 2.25 — and the no-hole tests bound the
    # resulting neighbor-covered under-sampling): 3x3 for edges in
    # (4, 4.5] (stride <= 1.5), 2x2 below (stride <= 2). No 1-sample
    # level: when a mesh projects small enough that sub-1.5 px ranks
    # carry real coverage, one sample per sliver loses ~20% of covered
    # pixels (measured) — the 2x2's four chances are load-bearing.
    small = []
    at_s = max(boundary(4.5), at)
    for kk, lo in ((3, 4.0), (2, None)):
        end = boundary(lo) if lo is not None else n_ranks
        if end > at_s:
            small.append((at_s, kk))
            at_s = end
    # rasterize() consumes big ((count, kk), ...) with counts = span
    # ENDS, and small ((start, kk), ...) with absolute span STARTS
    return tuple(sorted(tiers)), tuple(small)


def shadow_view_proj(state) -> jnp.ndarray:
    """Orthographic light view-proj (`ObjectRenderer::UpdateFrame`,
    `ObjectRenderer.cpp:175-185`): look-at from the light to the origin,
    ortho size = sceneSize * 1.5, zNear 1 / zFar 200."""
    size = state.scene_size * 1.5
    view = math3d.look_at_lh(
        state.light_pos[:3], jnp.zeros(3, jnp.float32),
        jnp.array([0.0, 1.0, 0.0], jnp.float32),
    )
    proj = math3d.orthographic_lh(size, size, 1.0, 200.0)
    return view @ proj


def rasterize(verts_clip, indices, width: int, height: int, k: int = 4,
              big_tiers=((2048, 12), (128, 48), (8, 256)),
              want_ids: bool = True, cull: int = 0,
              capacity: int | None = None, dense_top: int = 0,
              tail: tuple | None = None, band: tuple | None = None,
              small_tiers: tuple | None = None,
              dense_window: int | None = None):
    """Scatter z-buffer rasterization with tiered coverage.

    verts_clip: (V, 4) homogeneous clip positions; indices: (T, 3).
    Returns (depth (H, W) in [0,1], tri_id (H, W) int32, -1 = empty).

    band=(row_idx, n_bands): multi-chip row decomposition — called
    inside a `shard_map` over a "rows" device axis, return only screen
    rows [row_idx, row_idx+1) * height/n_bands. The per-triangle emit
    math replicates (cheap VPU work); the serialized scatter-min — this
    pass's dominant cost — only processes the band's own samples, so it
    scales ~1/n_bands per chip. Requires the packed-id path.

    Every triangle gets a k x k sample grid over its bbox; triangles whose
    bbox exceeds k px would be sampled sparsely (interior holes), so the
    largest `count` triangles by bbox edge additionally sample at the
    finer `kk` from big_tiers = ((count, kk), ...) — nested prefixes of
    the by-edge order (ranks [8,128) at 48, [128,2048) at 12, ...).

    Three scatter-budget levers on top of the ladder (the scatter-min
    costs a measured ~8 ns/update on v5e — every dead sample is real
    time; this is the mesh pass's dominant cost):

    - `cull`: +1/-1 drops triangles whose *signed screen area* has the
      other sign (0 = keep both sides). The mesh base pass passes +1 —
      with this loader's winding, area > 0 == front-facing — matching
      the reference's default CULL_BACK raster state
      (`ObjectRenderer.cpp` pipelines set no RS state; D3D12 default).
    - `capacity`: only the top `capacity` triangles (facing-and-edge
      sorted) emit scatter samples. With backface culling a closed mesh
      needs ~0.5T + margin; overflow drops the SMALLEST front-facing
      triangles (sub-pixel dots, z-buffer usually filled by neighbors'
      bbox samples). Open single-sided sheets must run cull=0 +
      capacity=None (config.mesh_backface_cull).
    - `dense_top`: the `dense_top` LARGEST triangles skip the sample
      grid entirely and are z-tested analytically at every pixel (edge
      functions on the (H, W) grid — pure VPU elementwise, no scatter).
      Exact coverage at any size for ~0.06 ms/triangle at 1280x800:
      strictly stronger *and* cheaper than the old top-8 256x256 grid
      tier (524k samples ~= 4 ms of scatter).
    - `tail=(frac, kk)`: the smallest `frac` of the emitted set (by the
      same edge order) samples at kk x kk instead of k x k. At demo
      distance the MEDIAN front-facing bbox is 2.7 px and the p99 is
      4.4 px — a 4x4 grid on those is mostly dead scatter updates;
      (0.6, 2) keeps identical coverage for bboxes <= 2 px and leans on
      bbox-overlapping neighbors beyond (no-hole-bounded by test).
    - `small_tiers=((start, kk), ...)`: the profile-driven replacement
      for `tail` (overrides it) — ABSOLUTE rank spans: ranks
      [start_i, start_{i+1}) emit kk_i x kk_i, the last span ends at
      the emit capacity. Produced by `derive_far_tiers` from the mesh's
      own rank profile, so each span's grid matches its actual bbox
      edges (down to ONE sample for sub-2 px ranks) instead of a fixed
      fraction at a fixed grid.
    - `dense_window`: evaluate the dense_top analytic pass on a
      (dense_window)^2 pixel window centred on the emitted geometry's
      screen bbox instead of the full screen (a full-screen eval costs
      ~0.06 ms/triangle at 1280x800 — ~1 ms for 16). Only valid when
      the caller guarantees the mesh's projected bbox fits the window
      (the far raster preset's contract: projected size <=
      raster_far_bound < window); ignored in band mode.

    Ranks covered by a finer big tier are excluded from the base grid
    (their tier grids are strictly denser).
    """
    v = verts_clip
    w_clip = v[:, 3]
    ndc = v[:, :3] / jnp.maximum(jnp.abs(w_clip[:, None]), 1e-20) * jnp.sign(
        w_clip[:, None]
    )
    px = (ndc[:, 0] * 0.5 + 0.5) * width
    py = (0.5 - ndc[:, 1] * 0.5) * height
    pz = ndc[:, 2]

    # ONE (V, 4) screen table -> three contiguous-ROW gathers for the
    # per-triangle corner fetch. The per-component form (px[t0], py[t0],
    # ...: 12 element gathers over V) measured 7.4 ms/frame at 69k
    # triangles — element gathers run ~65 Mtaps/s while row gathers are
    # ~5.6 ms/M rows regardless of width.
    vtab = jnp.stack([px, py, pz, w_clip], axis=1)           # (V, 4)
    t0, t1, t2 = indices[:, 0], indices[:, 1], indices[:, 2]
    r0, r1, r2 = vtab[t0], vtab[t1], vtab[t2]                # (T, 4) each
    x0, y0, z0, w0 = r0[:, 0], r0[:, 1], r0[:, 2], r0[:, 3]
    x1, y1, z1, w1 = r1[:, 0], r1[:, 1], r1[:, 2], r1[:, 3]
    x2, y2, z2, w2 = r2[:, 0], r2[:, 1], r2[:, 2], r2[:, 3]

    tri_ok = (w0 > 1e-6) & (w1 > 1e-6) & (w2 > 1e-6)

    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)

    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
    tri_ok = tri_ok & (jnp.abs(area) > 1e-12)
    if cull:
        tri_ok = tri_ok & (area * cull > 0)

    tids_all = jnp.arange(indices.shape[0], dtype=jnp.uint32)

    # one (T, 16) row table so a tier selection is ONE contiguous-row
    # gather (~5.6 ms/M rows) instead of 16 element gathers (~10 ms/M)
    cols = jnp.stack(
        [x0, y0, z0, x1, y1, z1, x2, y2, z2, inv_area,
         jnp.where(tri_ok, 1.0, 0.0), tids_all.astype(jnp.float32),
         xmin, ymin, xmax, ymax], axis=1)

    def emit(sel, kk: int):
        """Coverage samples for triangle subset `sel` (None = all) at a
        kk x kk grid -> (flat_pix, flat_zq, flat_tid)."""
        rows = cols if sel is None else cols[sel]
        x0c, y0c, z0c = rows[:, 0], rows[:, 1], rows[:, 2]
        x1c, y1c, z1c = rows[:, 3], rows[:, 4], rows[:, 5]
        x2c, y2c, z2c = rows[:, 6], rows[:, 7], rows[:, 8]
        inv_area_c = rows[:, 9]
        ok_c = rows[:, 10] > 0.5
        tid_c = rows[:, 11].astype(jnp.uint32)
        xminc, yminc = rows[:, 12], rows[:, 13]
        xmaxc, ymaxc = rows[:, 14], rows[:, 15]

        sx = jnp.maximum((xmaxc - xminc) / kk, 1.0)  # stride >= 1 px
        sy = jnp.maximum((ymaxc - yminc) / kk, 1.0)

        offs = jnp.arange(kk, dtype=jnp.float32)
        ox, oy = jnp.meshgrid(offs, offs, indexing="xy")  # (kk,kk)

        # sample positions snapped to pixel centers
        sxp = jnp.floor(xminc[:, None, None] + ox[None] * sx[:, None, None]) + 0.5
        syp = jnp.floor(yminc[:, None, None] + oy[None] * sy[:, None, None]) + 0.5

        b1 = (
            (sxp - x0c[:, None, None]) * (y2c - y0c)[:, None, None]
            - (x2c - x0c)[:, None, None] * (syp - y0c[:, None, None])
        ) * inv_area_c[:, None, None]
        b2 = (
            (x1c - x0c)[:, None, None] * (syp - y0c[:, None, None])
            - (sxp - x0c[:, None, None]) * (y1c - y0c)[:, None, None]
        ) * inv_area_c[:, None, None]
        b0 = 1.0 - b1 - b2
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)

        z = (b0 * z0c[:, None, None] + b1 * z1c[:, None, None]
             + b2 * z2c[:, None, None])

        xi = sxp.astype(jnp.int32)
        yi = syp.astype(jnp.int32)
        in_vp = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
        ok = inside & in_vp & ok_c[:, None, None] & (z >= 0.0) & (z <= 1.0)

        pix = jnp.where(ok, yi * width + xi, height * width)  # OOB if dead
        zq = jnp.clip(z * _ZQ, 0, _ZQ - 1).astype(jnp.uint32)
        zq = jnp.where(ok, zq, _BIG)
        tid = jnp.broadcast_to(tid_c[:, None, None], pix.shape)
        return pix.reshape(-1), zq.reshape(-1), tid.reshape(-1)

    T = indices.shape[0]
    tbits = 17
    pack_ids = want_ids and T < (1 << tbits)

    order = None
    if (big_tiers or dense_top or tail or small_tiers
            or (capacity is not None and capacity < T)):
        edge = jnp.where(tri_ok, jnp.maximum(xmax - xmin, ymax - ymin), -1.0)
        order = jnp.argsort(-edge)

    n_emit = capacity if (capacity is not None and capacity < T) else T
    # ranks already covered by a finer big tier (or the dense pass) are
    # excluded from the base grid — their tier grids are strictly denser
    big_max = min(max((c for c, _ in big_tiers), default=0), n_emit) \
        if order is not None else 0
    if small_tiers and order is not None and n_emit > 8:
        # profile-driven small end: base k on [big_max, start_0), then
        # each absolute span at its own grid, ending at n_emit
        starts = [max(min(st, n_emit), big_max + 1)
                  for st, _ in small_tiers]
        parts = [emit(order[big_max:starts[0]], k)]
        for i, (_, kk) in enumerate(small_tiers):
            end = starts[i + 1] if i + 1 < len(starts) else n_emit
            if end > starts[i]:
                parts.append(emit(order[starts[i]:end], kk))
    elif tail and order is not None and n_emit > 8:
        frac, tail_k = tail
        mid = max(int(n_emit * (1.0 - frac)), big_max + 1)
        parts = [emit(order[big_max:mid], k),
                 emit(order[mid:n_emit], tail_k)]
    elif order is not None and (n_emit < T or big_max):
        parts = [emit(order[big_max:n_emit], k)]
    else:
        parts = [emit(None, k)]
    at = min(dense_top, T)  # ranks [0, dense_top) go to the dense pass
    if big_tiers and order is not None:
        for count, kk in sorted(big_tiers):
            count = min(count, T)
            if count <= at:
                continue
            # finer tiers cover the larger triangles: tiers sorted by
            # count ascending so order[8:128] gets kk=48, order[128:2048]
            # kk=12 (ranks below 8 go dense or to the smallest count tier)
            parts.append(emit(order[at:count], kk))
            at = count

    flat_pix = jnp.concatenate([p[0] for p in parts])
    flat_zq = jnp.concatenate([p[1] for p in parts])
    tids = jnp.concatenate([p[2] for p in parts])

    # Pack (z15 | tid17) when the ids fit and scatter-min ONCE: nearest z
    # wins, ties to the lowest tid. Replaces the separate depth scatter +
    # winner GATHER (zbuf[flat_pix]) + id scatter. Depth comes back at 15
    # bits (~3e-5 clip z) — the consumers are continuous-vs-quantized
    # compares (volume occlusion, composite z-test), where that is
    # invisible; the reference's 24/32-bit buffers matter for
    # raster-vs-raster fighting we do not have.
    if band is not None:
        assert pack_ids, "banded raster requires the packed-id path"
        row_idx, n_bands = band
        assert height % n_bands == 0, (height, n_bands)
        out_h = height // n_bands
        row0_px = row_idx * out_h
        band_px = out_h * width
        # shift into band-local pixel space; anything outside (including
        # the dead-sample sentinel height*width) goes to the drop slot
        pix_l = flat_pix.astype(jnp.int32) - row0_px * width
        flat_pix = jnp.where(
            (pix_l >= 0) & (pix_l < band_px), pix_l, band_px
        ).astype(flat_pix.dtype)
    else:
        out_h = height
        row0_px = 0
        band_px = height * width

    if pack_ids:
        zq15 = flat_zq >> jnp.uint32(24 - 15)
        packed = jnp.where(flat_zq == _BIG, _BIG,
                           (zq15 << jnp.uint32(tbits)) | tids)
        pbuf = jnp.full((band_px + 1,), _BIG, jnp.uint32)
        pbuf = pbuf.at[flat_pix].min(packed, mode="drop")
        winner = pbuf[:band_px].reshape(out_h, width)
    elif not want_ids:
        zbuf = jnp.full((height * width + 1,), _BIG, jnp.uint32)
        zbuf = zbuf.at[flat_pix].min(flat_zq, mode="drop")
        winner = zbuf[: height * width].reshape(height, width)
    else:
        zbuf = jnp.full((height * width + 1,), _BIG, jnp.uint32)
        zbuf = zbuf.at[flat_pix].min(flat_zq, mode="drop")
        win = flat_zq == zbuf[flat_pix]
        tid_buf = jnp.full((height * width + 1,), _BIG, jnp.uint32)
        tid_buf = tid_buf.at[jnp.where(win, flat_pix, height * width)].min(
            tids, mode="drop"
        )
        depth = jnp.where(
            zbuf[: height * width] == _BIG, 1.0,
            zbuf[: height * width].astype(jnp.float32) / _ZQ
        ).reshape(height, width)
        tri_id = jnp.where(
            tid_buf[: height * width] == _BIG, -1,
            tid_buf[: height * width].astype(jnp.int32)
        ).reshape(height, width)
        return depth, tri_id

    # Dense analytic pass for the `dense_top` largest triangles: evaluate
    # the edge functions at every pixel center (same barycentric z as the
    # sample grid, same packing -> winner merge is one elementwise min).
    if dense_top and order is not None:
        dn = min(dense_top, T)
        drows = cols[order[:dn]]                                  # (dn, 16)
        use_dw = (band is None and dense_window is not None
                  and 0 < dense_window <= min(width, height))
        if use_dw:
            # centre the eval window on the emitted geometry's screen
            # bbox (the far preset guarantees it fits — see docstring)
            dw = int(dense_window)
            okm = cols[:, 10] > 0.5
            big_f = jnp.float32(1e9)
            bx0 = jnp.min(jnp.where(okm, cols[:, 12], big_f))
            by0 = jnp.min(jnp.where(okm, cols[:, 13], big_f))
            bx1 = jnp.max(jnp.where(okm, cols[:, 14], -big_f))
            by1 = jnp.max(jnp.where(okm, cols[:, 15], -big_f))
            x0d = jnp.clip(jnp.round((bx0 + bx1 - dw) * 0.5),
                           0, width - dw).astype(jnp.int32)
            y0d = jnp.clip(jnp.round((by0 + by1 - dw) * 0.5),
                           0, height - dw).astype(jnp.int32)
            xg = (jnp.arange(dw, dtype=jnp.float32)[None, :]
                  + x0d.astype(jnp.float32) + 0.5)
            yg = (jnp.arange(dw, dtype=jnp.float32)[:, None]
                  + y0d.astype(jnp.float32) + 0.5)
        else:
            xg = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
            row0_f = (jnp.float32(row0_px) if band is None
                      else row0_px.astype(jnp.float32))
            yg = (jnp.arange(out_h, dtype=jnp.float32)[:, None]
                  + row0_f + 0.5)

        def tri_min(i, acc):
            r = drows[i]
            dx0, dy0 = xg - r[0], yg - r[1]
            b1 = (dx0 * (r[7] - r[1]) - (r[6] - r[0]) * dy0) * r[9]
            b2 = ((r[3] - r[0]) * dy0 - dx0 * (r[4] - r[1])) * r[9]
            b0 = 1.0 - b1 - b2
            z = b0 * r[2] + b1 * r[5] + b2 * r[8]
            ok = ((b0 >= 0) & (b1 >= 0) & (b2 >= 0) & (r[10] > 0.5)
                  & (z >= 0.0) & (z <= 1.0))
            zq = jnp.clip(z * _ZQ, 0, _ZQ - 1).astype(jnp.uint32)
            if pack_ids:
                p = ((zq >> jnp.uint32(24 - 15)) << jnp.uint32(tbits)
                     ) | r[11].astype(jnp.uint32)
            else:
                p = zq
            return jnp.minimum(acc, jnp.where(ok, p, _BIG))

        if use_dw:
            acc0 = jax.lax.dynamic_slice(winner, (y0d, x0d), (dw, dw))
            dense = jax.lax.fori_loop(0, dn, tri_min, acc0)
            winner = jax.lax.dynamic_update_slice(winner, dense,
                                                  (y0d, x0d))
        else:
            winner = jax.lax.fori_loop(
                0, dn, tri_min, jnp.broadcast_to(winner, (out_h, width)))

    if pack_ids:
        tid_w = winner & jnp.uint32((1 << tbits) - 1)
        depth = jnp.where(winner == _BIG, 1.0,
                          (winner >> jnp.uint32(tbits)).astype(jnp.float32)
                          / float(1 << 15))
        tri_id = jnp.where(winner == _BIG, -1, tid_w.astype(jnp.int32))
        return depth, tri_id
    depth = jnp.where(winner == _BIG, 1.0,
                      winner.astype(jnp.float32) / _ZQ)
    return depth, jnp.full((height, width), -1, jnp.int32)


def _triangle_planes(verts_clip, pos, nrm, indices, width, height):
    """Per-triangle screen-affine interpolation planes: (T, 23).

    Perspective-correct interpolation of attribute a is
    (sum_i b_i a_i/w_i) / (sum_i b_i / w_i) with screen-affine
    barycentrics b_i, so every per-pixel quantity is a ratio of two
    AFFINE functions of (x, y). Baking (value at vertex 0, d/dx, d/dy)
    per triangle for the 7 planes {pos/w (3), nrm/w (3), 1/w} turns the
    deferred shade's THREE per-pixel vertex-row gathers + barycentric
    setup (`VSBasePass`/rasterizer interpolators) into ONE 23-float
    row gather + 14 FMAs — the gather bill is the mesh pass's dominant
    cost at the measured ~65 Mtaps/s XLA rate.

    Layout: [x0, y0, v0(7), d/dx(7), d/dy(7)] anchored at vertex 0's
    screen position (anchoring keeps the affine evaluation conditioned —
    absolute-coordinate plane constants lose ~3 digits at 1280 px).
    """
    v = verts_clip
    w_clip = jnp.maximum(v[:, 3], 1e-20)
    px = (v[:, 0] / w_clip * 0.5 + 0.5) * width
    py = (0.5 - v[:, 1] / w_clip * 0.5) * height
    inv_w = 1.0 / w_clip
    # one (V, 9) table -> three row gathers (vs 6 element + 3 row: the
    # per-component corner fetch was the raster's measured hot spot)
    vtab = jnp.concatenate(
        [px[:, None], py[:, None],
         pos * inv_w[:, None], nrm * inv_w[:, None], inv_w[:, None]],
        axis=1)                                               # (V, 9)

    t0, t1, t2 = indices[:, 0], indices[:, 1], indices[:, 2]
    r0, r1, r2 = vtab[t0], vtab[t1], vtab[t2]                 # (T, 9) each
    x0, y0 = r0[:, 0], r0[:, 1]
    x1, y1 = r1[:, 0], r1[:, 1]
    x2, y2 = r2[:, 0], r2[:, 1]
    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)

    a0, a1, a2 = r0[:, 2:], r1[:, 2:], r2[:, 2:]              # (T, 7)
    e1, e2 = a1 - a0, a2 - a0
    gx = (e1 * (y2 - y0)[:, None] - e2 * (y1 - y0)[:, None]) \
        * inv_area[:, None]
    gy = (e2 * (x1 - x0)[:, None] - e1 * (x2 - x0)[:, None]) \
        * inv_area[:, None]
    return jnp.concatenate(
        [x0[:, None], y0[:, None], a0, gx, gy], axis=1)       # (T, 23)


def _interp_planes(tbl, tri_id, width, height, origin=None):
    """tri_id (h, w) -> (valid, pos_local (x, y, z), nrm_local (x, y, z))
    scalar fields via one per-pixel plane-row gather (everything after
    the gather is SoA — trailing-3 arrays lane-pad 42x). `origin` offsets
    the pixel grid when tri_id is a window of the full screen."""
    t = jnp.clip(tri_id, 0, tbl.shape[0] - 1)
    row = tbl[t]                                              # (h, w, 23)

    h_w, w_w = tri_id.shape
    xs = jnp.arange(w_w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(h_w, dtype=jnp.float32) + 0.5
    if origin is not None:
        xs = xs + origin[0].astype(jnp.float32)
        ys = ys + origin[1].astype(jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
    dx = xg - row[..., 0]
    dy = yg - row[..., 1]

    def plane(i):
        return row[..., 2 + i] + row[..., 9 + i] * dx + row[..., 16 + i] * dy

    inv_w = 1.0 / jnp.maximum(plane(6), 1e-20)
    pos = tuple(plane(i) * inv_w for i in range(3))
    nrm = tuple(plane(3 + i) * inv_w for i in range(3))
    return tri_id >= 0, pos, nrm


def render_shadow_map(state, config: RenderConfig) -> jnp.ndarray:
    """Depth-only light-view rasterization (`RenderShadow`,
    `ObjectRenderer.cpp:220-243`). Called by the engine whenever the
    mesh or the light changes; the per-frame graph reads the cached map
    from state."""
    sm = config.shadow_map_size
    shadow_wvp = state.mesh_world @ shadow_view_proj(state)
    clip_sh = math3d.transform_point(state.mesh_verts[:, :3], shadow_wvp)
    cull = 1 if config.mesh_backface_cull else 0
    cap = (_cull_capacity(state.mesh_indices.shape[0])
           if config.mesh_backface_cull else None)
    # always NEAR_TIERS: the light-view projection is a fixed
    # orthographic frame (sceneSize * 1.5 over shadow_map_size px) —
    # the main camera's distance never changes shadow-texel density
    depth, _ = rasterize(clip_sh, state.mesh_indices, sm, sm,
                         big_tiers=NEAR_TIERS,
                         want_ids=False, cull=cull, capacity=cap,
                         dense_top=16, tail=config.raster_tail)
    return depth


def render_mesh(state, camera: Camera, config: RenderConfig,
                device_mesh=None) -> MeshOutput:
    """Base pass + deferred shading (the shadow map is cached in state).

    device_mesh: a jax.sharding.Mesh with a "rows" axis row-decomposes
    the base raster's scatter-min over chips (the pass's dominant,
    serialized cost — SURVEY section-2.6's screen-space axis); the
    per-triangle emit math replicates."""
    width, height = config.width, config.height
    sm = config.shadow_map_size

    world = state.mesh_world
    view_proj = camera.view_proj
    wvp = world @ view_proj
    s_vp = shadow_view_proj(state)
    shadow_wvp = world @ s_vp

    pos = state.mesh_verts[:, :3]
    nrm = state.mesh_verts[:, 3:6]
    idx = state.mesh_indices

    # --- shadow map: cached in state (mesh + light static per frame) ----
    shadow_depth = state.mesh_shadow_map

    # --- base pass: jittered raster ---------------------------------------
    jitter = halton_jitter(state.frame_idx, float(width), float(height))
    clip = math3d.transform_point(pos, wvp)
    clip_jit = clip.at[:, :2].add(jitter[None] * clip[:, 3:4])
    # cull=+1: with this loader's CCW winding, positive signed screen
    # area == front-facing (the reference's default CULL_BACK raster
    # state); the top-16 largest triangles rasterize analytically
    # (dense_top) so no 256x256 grid tier is needed.
    cull = 1 if config.mesh_backface_cull else 0
    cap = (_cull_capacity(idx.shape[0])
           if config.mesh_backface_cull else None)
    # tier ladder: the host picked the preset for THIS frame's projected
    # mesh size (config.raster_preset is a static jit key, so each
    # preset compiles once; engine.select_raster_preset does the pick).
    # The far preset adds the profile-driven small-tier ladder and the
    # windowed dense pass — both contracts hold because the preset pick
    # guarantees the projected bbox <= raster_far_bound.
    far = bool(config.raster_preset == "far" and config.raster_far_tiers)
    tiers = config.raster_far_tiers if far else NEAR_TIERS
    small = config.raster_far_small if far else None
    # The host pick's hysteresis HOLDS the far preset until the bbox
    # exceeds 1.05x the bound (engine.select_raster_preset) — so "the
    # window provably contains the mesh" means window >= ceil(1.05 *
    # bound), not the bare bound. Gating on the bound alone lets a
    # window == bound config drop mesh pixels in the hysteresis band.
    far_ceiling = -(-21 * int(config.raster_far_bound) // 20)
    # dense window only when it provably contains the mesh
    dw = (config.mesh_shade_window
          if far and config.mesh_shade_window >= far_ceiling
          else None)
    n_rows = (device_mesh.shape["rows"]
              if device_mesh is not None
              and "rows" in device_mesh.axis_names else 1)
    if n_rows > 1 and height % n_rows == 0 and idx.shape[0] < (1 << 17):
        from jax.sharding import PartitionSpec as P

        def raster_band(clip_l, idx_l):
            r = jax.lax.axis_index("rows")
            return rasterize(clip_l, idx_l, width, height,
                             big_tiers=tiers,
                             cull=cull, capacity=cap, dense_top=16,
                             tail=config.raster_tail, band=(r, n_rows),
                             small_tiers=small)

        depth, tri_id = jax.shard_map(
            raster_band, mesh=device_mesh,
            in_specs=(P(), P()), out_specs=P("rows"),
            check_vma=False)(clip_jit, idx)
    else:
        depth, tri_id = rasterize(clip_jit, idx, width, height,
                                  big_tiers=tiers,
                                  cull=cull, capacity=cap, dense_top=16,
                                  tail=config.raster_tail,
                                  small_tiers=small, dense_window=dw)

    # projected mesh bbox centre (pixels) — anchors the deferred-shade
    # window here and TAA's windowed history reprojection downstream
    wc = clip[:, 3]
    okv = wc > 1e-6
    cxs = (clip[:, 0] / jnp.maximum(wc, 1e-6) * 0.5 + 0.5) * width
    cys = (0.5 - clip[:, 1] / jnp.maximum(wc, 1e-6) * 0.5) * height
    big = jnp.float32(1e9)
    cx = (jnp.min(jnp.where(okv, cxs, big))
          + jnp.max(jnp.where(okv, cxs, -big))) * 0.5
    cy = (jnp.min(jnp.where(okv, cys, big))
          + jnp.max(jnp.where(okv, cys, -big))) * 0.5

    # Deferred-shade window (config.mesh_shade_window): the plane-row
    # gather, shadow PCF and BRDF run only in a static window around the
    # mesh bbox — the per-pixel gathers are this pass's dominant screen
    # cost and the mesh covers a fraction of the frame. The depth buffer
    # stays full-screen (volume occlusion is exact everywhere). FAR
    # preset only: the host-side preset pick guarantees the projected
    # bbox <= raster_far_bound <= window, so the window is invisible by
    # construction; the near preset (close-ups, or no pick made) shades
    # full-screen — a mesh can never silently show background outside a
    # window it outgrew.
    win = config.mesh_shade_window
    use_window = (0 < win < min(width, height) and far
                  and win >= far_ceiling)

    # One per-TRIANGLE plane table -> ONE row gather per pixel (vs three
    # vertex rows + barycentric setup; see _triangle_planes). Barycentric
    # interpolation commutes with affine maps, so only the local
    # position + normal interpolate; every derived space (world,
    # light-clip, current/previous clip) is one exact per-pixel matrix
    # transform of the interpolated position.
    tbl = _triangle_planes(clip_jit, pos, nrm, idx, width, height)

    def pt_soa(m, x, y, z):
        return (x * m[0, 0] + y * m[1, 0] + z * m[2, 0] + m[3, 0],
                x * m[0, 1] + y * m[1, 1] + z * m[2, 1] + m[3, 1],
                x * m[0, 2] + y * m[1, 2] + z * m[2, 2] + m[3, 2],
                x * m[0, 3] + y * m[1, 3] + z * m[2, 3] + m[3, 3])

    def vec_soa(m, x, y, z):
        return (x * m[0, 0] + y * m[1, 0] + z * m[2, 0],
                x * m[0, 1] + y * m[1, 1] + z * m[2, 1],
                x * m[0, 2] + y * m[1, 2] + z * m[2, 2])

    def shade_window(tri_w, origin):
        """tri-id window -> (col 3-tuple, vel 2-tuple, valid), all
        tri_w-shaped. Pure per-pixel work, so it row-decomposes."""
        valid, pl_, nl_ = _interp_planes(tbl, tri_w, width, height,
                                         origin=origin)
        wsx, wsy, wsz, _ = pt_soa(world, *pl_)       # affine: w == 1
        nrm_w = vec_soa(world, *nl_)
        lsx, lsy, lsz, _ = pt_soa(shadow_wvp, *pl_)
        csx, csy, _csz, csw = pt_soa(wvp, *pl_)
        tsx, tsy, _tsz, tsw = pt_soa(state.mesh_prev_wvp, *pl_)
        color, velocity = shade_base_pass(
            (wsx, wsy, wsz), nrm_w, (lsx, lsy, lsz),
            (csx, csy, csw), (tsx, tsy, tsw),
            camera.eye, state.light_pos, state.light_color,
            state.ambient, state.sh_coeffs, shadow_depth,
            shadow_quads=state.mesh_shadow_quads,
            has_light_probe=config.has_light_probe,
        )
        zero_w = jnp.zeros_like(wsx)
        col = tuple(jnp.where(valid, c, zero_w) for c in color)
        vel = tuple(jnp.where(valid, c, zero_w) for c in velocity)
        return col, vel, valid

    if use_window:
        x0w = jnp.clip(jnp.round(cx - win * 0.5),
                       0, width - win).astype(jnp.int32)
        y0w = jnp.clip(jnp.round(cy - win * 0.5),
                       0, height - win).astype(jnp.int32)
        if n_rows > 1 and win % n_rows == 0:
            # row-decompose the shade window too: each device gathers
            # the full tri-id map (one small all-gather) and shades its
            # win/n_rows row band of the window
            from jax.sharding import PartitionSpec as P

            wb = win // n_rows

            def shade_band(tri_sh, y0_, x0_):
                r = jax.lax.axis_index("rows")
                tri_full = jax.lax.all_gather(
                    tri_sh, "rows", axis=0, tiled=True)
                y0b = y0_[0] + r * wb
                tri_w = jax.lax.dynamic_slice(
                    tri_full, (y0b, x0_[0]), (wb, win))
                col_, vel_, valid_ = shade_window(tri_w, (x0_[0], y0b))
                return col_ + vel_ + (valid_,)

            outs = jax.shard_map(
                shade_band, mesh=device_mesh,
                in_specs=(P("rows"), P(), P()),
                out_specs=P("rows"), check_vma=False,
            )(tri_id, y0w[None], x0w[None])
            col, vel, valid = outs[:3], outs[3:5], outs[5]
        else:
            tri_w = jax.lax.dynamic_slice(tri_id, (y0w, x0w), (win, win))
            col, vel, valid = shade_window(tri_w, (x0w, y0w))
        zero = jnp.zeros_like(depth)
        col = tuple(jax.lax.dynamic_update_slice(zero, c, (y0w, x0w))
                    for c in col)
        vel = tuple(jax.lax.dynamic_update_slice(zero, c, (y0w, x0w))
                    for c in vel)
        valid = jax.lax.dynamic_update_slice(
            jnp.zeros_like(depth, dtype=bool), valid, (y0w, x0w))
    else:
        col, vel, valid = shade_window(tri_id, None)

    return MeshOutput(
        color=col,
        valid=valid,
        velocity=vel,
        depth=depth,
        shadow=shadow_depth,
        shadow_vp=s_vp,
        new_prev_wvp=wvp,
        screen_center=(cx, cy),
    )


def shade_base_pass(ws, nrm, ls, cs, ts, eye,
                    light_pos, light_color, ambient, sh_coeffs,
                    shadow_map, shadow_quads=None,
                    has_light_probe: bool = True):
    """`PSBasePass.hlsl:94-153`, SoA: every argument is a tuple of
    scalar (H, W) fields — ws/nrm/ls are (x, y, z); cs/ts are clip
    (x, y, w). Returns ((r, g, b), (vx, vy)). A trailing 3-channel dim
    would lane-pad every elementwise op 42x (measured ~34 ms of the
    round-3 mesh profile); the env reflection is an SH reconstruction
    (zero gathers — see sh.eval_radiance)."""
    base_color = (1.0, 0.6, 0.2)
    diffuse_brdf = tuple(c / np.pi for c in base_color)

    wsx, wsy, wsz = ws
    shadow = _shadow_map_compare(ls[0], ls[1], ls[2], shadow_map,
                                 shadow_quads)

    ninv = jax.lax.rsqrt(jnp.maximum(
        nrm[0] * nrm[0] + nrm[1] * nrm[1] + nrm[2] * nrm[2], 1e-20))
    nx, ny, nz = nrm[0] * ninv, nrm[1] * ninv, nrm[2] * ninv

    csx, csy, csw = cs
    tsx, tsy, tsw = ts
    csw = jnp.maximum(csw, 1e-20)
    tsw = jnp.maximum(tsw, 1e-20)
    velocity = ((csx / csw - tsx / tsw) * 0.5,
                (csy / csw - tsy / tsw) * -0.5)

    l = light_pos[:3] / jnp.linalg.norm(light_pos[:3])
    no_l = jnp.clip(nx * l[0] + ny * l[1] + nz * l[2], 0.0, 1.0)

    vx_, vy_, vz_ = eye[0] - wsx, eye[1] - wsy, eye[2] - wsz
    vinv = jax.lax.rsqrt(jnp.maximum(
        vx_ * vx_ + vy_ * vy_ + vz_ * vz_, 1e-20))
    vx_, vy_, vz_ = vx_ * vinv, vy_ * vinv, vz_ * vinv
    no_v = jnp.clip(nx * vx_ + ny * vy_ + nz * vz_, 0.0, 1.0)

    hx, hy, hz = vx_ + l[0], vy_ + l[1], vz_ + l[2]
    hinv = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-20))
    no_h = jnp.clip((nx * hx + ny * hy + nz * hz) * hinv, 0.0, 1.0)

    lcol = light_color[:3] * light_color[3]
    if has_light_probe:
        amb = sh_lib.eval_irradiance_soa(sh_coeffs, nx, ny, nz)
        # reflect(-V, N), unit by construction
        vn = nx * vx_ + ny * vy_ + nz * vz_
        rx = 2.0 * vn * nx - vx_
        ry = 2.0 * vn * ny - vy_
        rz = 2.0 * vn * nz - vz_
        rad = sh_lib.eval_radiance_soa(sh_coeffs, rx, ry, rz)
        # Karis analytic env BRDF (`PSBasePass.hlsl:135-141`), rough 0.4
        rough = 0.4
        c0 = (-1.0, -0.0275, -0.572, 0.022)
        c1 = (1.0, 0.0425, 1.04, -0.04)
        rv = tuple(rough * a + b for a, b in zip(c0, c1))
        a004 = jnp.minimum(rv[0] * rv[0],
                           jnp.exp2(-9.28 * no_v)) * rv[0] + rv[1]
        env = 0.04 * (-1.04 * a004 + rv[2]) + (1.04 * a004 + rv[3])
        rad = tuple(r * env for r in rad)
    else:
        ay = ambient[:3] * ambient[3]
        scale = 0.5 + 0.5 * (ny * 0.5 + 0.5)
        amb = tuple(ay[c] * scale for c in range(3))
        rad = (0.0, 0.0, 0.0)

    fresnel = (1.0 - no_v) ** 5
    spec_ref = 0.08
    fres = fresnel * (1.0 - spec_ref) + spec_ref
    spec = jnp.power(no_h, 64.0) * fres

    color = tuple(
        (diffuse_brdf[c] * no_l + spec) * (lcol[c] * shadow)
        + diffuse_brdf[c] * amb[c] + rad[c]
        for c in range(3)
    )
    return color, velocity


def build_shadow_quads(shadow_map):
    """Pre-pack the shadow map into 2x2 quads at all four (row, col)
    parities: (Sm, Sm) -> (4*(Sm/2)^2, 4), so the PCF footprint is ONE
    row gather per pixel. The stride-2 deinterleave costs ~70 ms/Mpx on
    v5e — build it ONCE per shadow-map refresh (the map is cached in
    state; `engine._refresh_shadow_map`), never per frame. Returns a
    (1, 4) placeholder for odd sizes (compare falls back to row pairs)."""
    h, w = shadow_map.shape
    if h % 2 or w % 2:
        return jnp.zeros((1, 4), jnp.float32)
    hh, ww = h // 2, w // 2
    sm_pad = jnp.pad(shadow_map, ((0, 1), (0, 1)), mode="edge")
    quads = []
    for py in (0, 1):
        for px_ in (0, 1):
            sub = sm_pad[py:py + h, px_:px_ + w]
            quads.append(jnp.stack(
                [sub[0::2, 0::2], sub[0::2, 1::2],
                 sub[1::2, 0::2], sub[1::2, 1::2]], -1
            ).reshape(hh * ww, 4))
    return jnp.concatenate(quads, 0)


def _shadow_map_compare(lsx, lsy, lsz, shadow_map, quads=None,
                        bias: float = 0.0027):
    """`ShadowMap` (`PSBasePass.hlsl:73-79`): PCF compare at the light-clip
    position (scalar fields; no matrix transform — already light-space).

    The 2x2 footprint costs ONE packed-row gather: the map is pre-packed
    into 2x2 quads at all four (row, column) parities; each pixel picks
    the sub-table matching its tap origin's parity and fetches all four
    taps in one row. (Element gathers run ~65 Mtaps/s on v5e; a (2, 2)
    block gather via lax.gather slice_sizes measured 6x slower still —
    packing is the only fast shape.) Odd map sizes fall back to the
    two-row-pair formulation."""
    z = lsz - bias

    h, w = shadow_map.shape
    x = (lsx * 0.5 + 0.5) * w - 0.5
    y = (1.0 - (lsy * 0.5 + 0.5)) * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)

    def cidx(vv, nn):
        return jnp.clip(vv.astype(jnp.int32), 0, nn - 1)

    x0 = cidx(x0f, w - 1)   # tap origin; +1 neighbors in range via pad
    y0 = cidx(y0f, h - 1)
    fx = jnp.clip(x - x0.astype(jnp.float32), 0.0, 1.0)
    fy = jnp.clip(y - y0.astype(jnp.float32), 0.0, 1.0)

    if h % 2 or w % 2:
        # odd sizes: two row-pair gathers (cheap contiguous build)
        half = w // 2 + 1
        sm_pad = jnp.pad(shadow_map, ((0, 1), (0, 2)), mode="edge")
        even = sm_pad[:h, : 2 * half].reshape(h * half, 2)
        odd = sm_pad[:h, 1: 1 + 2 * half].reshape(h * half, 2)
        table = jnp.concatenate([even, odd], 0)
        base = ((x0 & 1) * (h * half)).astype(jnp.int32)

        def row(yi):
            pair = table[base + yi * half + (x0 >> 1)]
            c = (z[..., None] <= pair).astype(jnp.float32)
            return c[..., 0] * (1 - fx) + c[..., 1] * fx

        y1 = cidx(y0f + 1, h)
        return row(y0) * (1 - fy) + row(y1) * fy

    hh, ww = h // 2, w // 2
    if quads is None or quads.shape[0] != 4 * hh * ww:
        quads = build_shadow_quads(shadow_map)   # uncached fallback

    base = (((y0 & 1) * 2 + (x0 & 1)) * (hh * ww)).astype(jnp.int32)
    quad = quads[base + (y0 >> 1) * ww + (x0 >> 1)]   # (..., 4)
    c = (z[..., None] <= quad).astype(jnp.float32)
    c0 = c[..., 0] * (1 - fx) + c[..., 1] * fx
    c1 = c[..., 2] * (1 - fx) + c[..., 3] * fx
    return c0 * (1 - fy) + c1 * fy
