"""Pallas screen-tile OIT composite — the whole screen pass in one kernel.

Semantics: `render/warp.py::composite_oit_warp` with the *dense exact*
pass-2 everywhere (reference anchor: `PSCube.hlsli:51-108` cube sampling +
`PSDepthPeel.hlsl` nearest-K + `PSResolveOIT.hlsl:12-26` under-blend).
Per screen tile:

  for each volume overlapping the tile (per-tile bbox-culled lists,
  scalar-prefetched):
    DMA the volume's 6 face images (HBM -> VMEM, ~0.8 MB bf16),
    double-buffered: the next listed volume's faces prefetch while the
    current one warps, so the copy latency rides under compute;
    per pixel: analytic ray/box exit, exit-face select, exit clip-z,
    scene-depth occlusion (one fused elementwise block);
    per exit face: the Catmull-Smith two-pass projective warp evaluated
    EXACTLY as dynamic-range sweeps (below);
    streaming nearest-K insert into the VMEM-resident layer buffer;
  finally front-to-back under-blend -> one (4, th, tw) RGBA tile.

Why sweeps, not matmuls: the exact warp's per-pixel tent weights make
every matmul formulation batched-THIN (~0.2 TFLOP/s via XLA — measured,
docs/ARCHITECTURE.md), and in-VMEM take_along_axis is a compare-select
scan (~0.55 G taps/s). But a tent has only 2 non-zero taps per output, so
sweeping the *source* axis turns each pass into `range` broadcast-FMAs of
full (th, tw) tiles on the VPU — full vector rate, zero gathers:

  pass 1 (u): tmp[c,v,x] += img[c,v,u] * max(0, 1-|cu(v,x)-u|)
  pass 2 (v): out[c,y,x] += tmp[c,v,x] * max(0, 1-|vt(y,x)-v|)

`img[c,:,u]` must broadcast along lanes with v in sublanes; a dynamic
lane index is not a TPU primitive, so an 8-wide one-hot MXU matmul
(img (4*S, S) @ onehot (S, 8)) hoists 8 source columns into sublane-major
layout per step and static lane slices feed the FMAs. The sweep ranges
[u_lo, u_hi] / [v_lo, v_hi] come from masked min/max of the homography
coordinates over the tile, so cost tracks each volume's actual footprint
and effective (LOD) resolution — and is camera-angle independent, unlike
the rectified/dense `lax.cond` mix this replaces (which also doubled the
composite's XLA graph and its compile time).

Replaces on the hot path: `warp.composite_oit_warp`'s per-volume scan
(dynamic_update_slice layer churn — the ~10k-copy trace finding) and its
per-face cond. The warp module remains the XLA semantics twin for tests.

Layout contracts (see render/tilecast.py for the host-side prep):
  * face images arrive pre-swapped (Catmull-Smith orientation chosen per
    (volume, face) at the footprint centre) and minor-padded to 128;
  * homography vectors arrive texel-scaled (p = n_eff*nu - 0.5*den);
  * per-tile volume lists have capacity N (never silently truncated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multivolumes_tpu.config import SharedConsts
from multivolumes_tpu.ops.pallas import interpret_default

_Z_NEAR = float(SharedConsts.Z_NEAR)
_Z_FAR = float(SharedConsts.Z_FAR)

FLT_MAX = 3.402823466e38
_EPS = 1e-12
_BIG = 1e30

# The depth-weighted variant's scratch (+0.9 MB cube-depth slots, +0.1 MB
# pass-1 depth plane) plus Mosaic's own scoped temporaries lands at
# ~16.2 MB — just over the default 16 MB scoped-VMEM cap on v5e, whose
# physical VMEM is 128 MB. Raise the cap (same stance as
# lightsweep_kernel._COMPILER_PARAMS) rather than shrinking the
# double-buffered face slots, which are what hide the per-volume DMA.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _safe(x, eps=_EPS):
    return jnp.where(jnp.abs(x) > eps, x, jnp.where(x >= 0, eps, -eps))


def _row_window_variants(r_min, r_max, total: int, run, quarters: bool):
    """Run `run(start, span)` on exactly ONE static row window covering
    the inclusive scalar row range [r_min, r_max] (0 <= r_min <= r_max
    < total, total % 4 == 0).

    This is the Mosaic-safe replacement for dynamic-offset VMEM stores:
    the 2026-08 MV_CKERNEL_SUBGRID experiment windowed rows with
    `pl.ds(r0, span)` at a traced 8-aligned r0 and SIGABRTed the real
    backend ("Check failed: limits[i] <= dim(i)", v5e, pl.multiple_of
    hints included). Quantizing the window to quarter-grid STATIC
    offsets and selecting the (start, span) pair with `pl.when` keeps
    every load/store offset a compile-time constant — nothing dynamic
    reaches the store path — at the cost of up to one quarter of
    overshoot on each side. Exactly one predicate fires by
    construction (they partition on (q_lo, q_hi)); `run` must be
    idempotent per call site (it runs once)."""
    q = total // 4
    q_lo = jnp.clip(r_min // q, 0, 3)
    q_hi = jnp.clip(r_max // q, 0, 3)
    two = q_hi <= q_lo + 1
    if quarters:
        one = q_hi == q_lo
        for k in range(4):
            @pl.when(one & (q_lo == k))
            def _(k=k):
                run(k * q, q)
        for k in range(3):
            @pl.when(~one & two & (jnp.minimum(q_lo, 2) == k))
            def _(k=k):
                run(k * q, 2 * q)
    else:
        for k in range(3):
            @pl.when(two & (jnp.minimum(q_lo, 2) == k))
            def _(k=k):
                run(k * q, 2 * q)

    @pl.when(~two)
    def _():
        run(0, total)


def _finite(x):
    # magnitude guard instead of isfinite: kills inf/NaN from degenerate
    # homography ratios (NaN compares false -> 0)
    return jnp.where(jnp.abs(x) < _BIG, x, 0.0)


def _make_kernel(n, s, s_pad, th, tw, tiles_x, k_layers, width, height,
                 u_block=8, rowwin=(True, True), with_depth=False,
                 dma_ext=False):
    """Bind static geometry; return the kernel body.

    rowwin = (pass-2 face-sweep windows, nearest-K-insert windows) —
    independently switchable static row windows (MV_CKERNEL_ROWWIN).

    with_depth=True adds the paper's depth-aware CubeCast weights
    (`PSCube.hlsli:51-108`): the volume's cube DEPTH map (pre-unprojected
    to view distance, host-side) rides a second DMA next to the faces,
    pass 1 interpolates it along u exactly like a color channel (the u
    tent weights sum to 1, so the result is a true interpolation of the
    two adjacent texels' depths), and pass 2 modulates each v tap by
    max(1 - 0.5*|sceneDist - tapDist|, 0), normalizing by the weight sum
    with the reference's plain-filter fallback where every weight is
    zero (`PSCube.hlsli:104`). Tiles containing no mesh pixel take the
    plain path (scene depth 1 zeroes every weight there anyway), so the
    extra pass-1 channel and the 9-accumulator pass 2 only run where a
    seam can exist."""

    def body(tlist, counts, vol_flt, face_flt, row0, color_hbm, depth_hbm,
             scene_ref, out_ref, vol_scr, dep_scr, tmp_scr, tmpd_scr,
             face_scr, layers_scr, sem, sem_d):
        t = pl.program_id(0)
        # row0: global tile-row offset of this shard (0 single-device;
        # the row-sharded path composites a contiguous band of tile
        # rows per device, but NDC needs GLOBAL pixel coordinates)
        ty = t // tiles_x + row0[0]
        tx = t % tiles_x
        count = counts[t]

        col_i = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1
                                         ).astype(jnp.float32)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0
                                         ).astype(jnp.float32)
        tx_f = (tx * tw).astype(jnp.float32)
        ty_f = (ty * th).astype(jnp.float32)
        xg = (tx_f + col_i + 0.5) / width * 2.0 - 1.0      # (th, tw) NDC
        yg = -((ty_f + row_i + 0.5) / height * 2.0 - 1.0)
        # tile y extent in NDC (yg decreases with row) + 2px pad for the
        # pass-1 row-liveness test
        pad_y = 2.0 / height * 2.0
        y_top = -((ty_f + 0.5) / height * 2.0 - 1.0) + pad_y
        y_bot = -((ty_f + th - 0.5) / height * 2.0 - 1.0) - pad_y

        scene_z = scene_ref[...]                           # (th, tw)
        if with_depth:
            # any real mesh pixel in this tile? (clip z in (0, 1); the
            # screen pad is 0 and empty background is 1)
            mesh_t = jnp.max(((scene_z > 0.0) & (scene_z < 1.0))
                             .astype(jnp.int32)) > 0
        else:
            mesh_t = None

        layers_scr[0] = jnp.full((k_layers, th, tw), FLT_MAX, jnp.float32)
        for ch in range(1, 5):
            layers_scr[ch] = jnp.zeros((k_layers, th, tw), jnp.float32)

        # pass-1 face-row grid: rows r of the face image, columns = tile x
        r_col = jax.lax.broadcasted_iota(jnp.int32, (s, tw), 0
                                         ).astype(jnp.float32)
        x_row = (tx_f
                 + jax.lax.broadcasted_iota(jnp.int32, (s, tw), 1
                                            ).astype(jnp.float32)
                 + 0.5) / width * 2.0 - 1.0                # (s, tw)
        sel_row = jax.lax.broadcasted_iota(jnp.int32, (s_pad, u_block), 0)
        sel_col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, u_block), 1)

        def face_copy(i, slot, ext: int):
            return pltpu.make_async_copy(
                color_hbm.at[tlist[t, i], :, :, pl.ds(0, ext)],
                vol_scr.at[slot, :, :, pl.ds(0, ext)], sem.at[slot])

        def dep_copy(i, slot, ext: int):
            return pltpu.make_async_copy(
                depth_hbm.at[tlist[t, i], :, pl.ds(0, ext)],
                dep_scr.at[slot, :, pl.ds(0, ext)], sem_d.at[slot])

        # Per-volume DMA extents: a volume at effective resolution n_eff
        # only ever has its first n_eff face ROWS read (every sweep range
        # is clipped to hi = n_eff - 1; rows beyond stay stale in VMEM
        # and are never read by pass 2, so stale garbage is dead). Most
        # volumes at n=64 sit in the S/2 and S/4 LOD buckets — copying
        # their full (6, 4, S, S_pad) slab paid ~4x the bytes per
        # (tile, volume) pair, and for low-LOD volumes the tiny sweeps
        # leave no compute to hide the full-slab copy under. The extent
        # variant is derived from the scalar-prefetched n_eff, so start
        # and wait (same vid) always pick the same chain.
        exts = ([s, s // 2, s // 4] if dma_ext and s % 32 == 0 else [s])

        def _variant(i):
            nv = vol_flt[tlist[t, i], 20]
            # largest extent covering n_eff: exts[k] >= nv > exts[k+1]
            return [(nv > (exts[k + 1] if k + 1 < len(exts) else 0))
                    & ((nv <= exts[k - 1] // 2) if k > 0 else True)
                    for k in range(len(exts))]

        def start_copies(i, slot):
            for k, ok in enumerate(_variant(i)):
                @pl.when(ok)
                def _(k=k):
                    face_copy(i, slot, exts[k]).start()
                    if with_depth:
                        # depth rides only on MESH tiles: the weights
                        # are read exclusively under the mesh_t gate
                        # below, and the (6, S, S_pad) f32 plane is
                        # +50% on the color DMA. mesh_t is tile-uniform
                        # and known before the first copy, so every
                        # started copy is waited (same gate both sides).
                        @pl.when(mesh_t)
                        def _():
                            dep_copy(i, slot, exts[k]).start()

        def wait_copies(i, slot):
            for k, ok in enumerate(_variant(i)):
                @pl.when(ok)
                def _(k=k):
                    face_copy(i, slot, exts[k]).wait()
                    if with_depth:
                        @pl.when(mesh_t)
                        def _():
                            dep_copy(i, slot, exts[k]).wait()

        def vol_body(i, _):
            vid = tlist[t, i]
            slot = jax.lax.rem(i, 2)

            # prefetch the NEXT listed volume's faces into the other slot
            # while this volume computes (the copy chain is unconditional
            # — a skipped volume's ~0.8 MB copy is cheap, and an
            # unconditional chain cannot leak an unwaited semaphore; the
            # expensive warps + K-insert below stay validity-gated)
            @pl.when(i + 1 < count)
            def _():
                start_copies(i + 1, 1 - slot)

            b00 = vol_flt[vid, 0]
            b01 = vol_flt[vid, 1]
            b02 = vol_flt[vid, 2]
            b10 = vol_flt[vid, 3]
            b11 = vol_flt[vid, 4]
            b12 = vol_flt[vid, 5]
            b20 = vol_flt[vid, 6]
            b21 = vol_flt[vid, 7]
            b22 = vol_flt[vid, 8]
            o0 = vol_flt[vid, 9]
            o1 = vol_flt[vid, 10]
            o2 = vol_flt[vid, 11]
            wz0 = vol_flt[vid, 12]
            wz1 = vol_flt[vid, 13]
            wz2 = vol_flt[vid, 14]
            wz3 = vol_flt[vid, 15]
            ww0 = vol_flt[vid, 16]
            ww1 = vol_flt[vid, 17]
            ww2 = vol_flt[vid, 18]
            ww3 = vol_flt[vid, 19]
            n_eff = vol_flt[vid, 20]
            hi = n_eff - 1.0

            # ray/box exit (composite._ray_box_exit_soa, tile-local)
            dlx = b00 * xg + b10 * yg + b20
            dly = b01 * xg + b11 * yg + b21
            dlz = b02 * xg + b12 * yg + b22

            def slab(o, d):
                ds_ = jnp.where(jnp.abs(d) > _EPS, d,
                                jnp.where(d >= 0, _EPS, -_EPS))
                t1 = (-1.0 - o) / ds_
                t2 = (1.0 - o) / ds_
                return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

            ix, ox_ = slab(o0, dlx)
            iy, oy_ = slab(o1, dly)
            iz, oz_ = slab(o2, dlz)
            t_near = jnp.maximum(jnp.maximum(ix, iy), iz)
            t_far = jnp.minimum(jnp.minimum(ox_, oy_), oz_)
            hit = t_far > jnp.maximum(t_near, 0.0)
            qx = o0 + dlx * t_far
            qy = o1 + dly * t_far
            qz = o2 + dlz * t_far

            # exit-face select (composite.dir_to_face_uv_soa face order)
            ax, ay, az = jnp.abs(qx), jnp.abs(qy), jnp.abs(qz)
            is_x = (ax >= ay) & (ax >= az)
            is_y = (~is_x) & (ay >= az)
            face = jnp.where(
                is_x,
                jnp.where(qx >= 0, 0, 1),
                jnp.where(is_y, jnp.where(qy >= 0, 2, 3),
                          jnp.where(qz >= 0, 4, 5)),
            ).astype(jnp.int32)

            hz = qx * wz0 + qy * wz1 + qz * wz2 + wz3
            hw = qx * ww0 + qy * ww1 + qz * ww2 + ww3
            exit_z = hz / jnp.maximum(hw, 1e-20)
            valid = (hit & (hw > 0.0) & (exit_z <= scene_z)
                     & (exit_z > 0.0))

            wait_copies(i, slot)

            # a listed volume can still touch no pixel of THIS tile
            # (bbox overlap but fully occluded/missed): skip its warps
            # and K-insert entirely (its faces were prefetched above)
            @pl.when(jnp.max(valid.astype(jnp.int32)) > 0)
            def _():
                rr = jnp.zeros((th, tw), jnp.float32)
                gg = jnp.zeros((th, tw), jnp.float32)
                bb = jnp.zeros((th, tw), jnp.float32)
                aa = jnp.zeros((th, tw), jnp.float32)

                for f in range(6):
                    use_f = valid & (face == f)
                    # face skip via pl.when; the select below is safe
                    # even against a stale face_scr because use_f is
                    # then empty
                    _face_warp(f, use_f, vid, slot, face_flt, vol_scr,
                               tmp_scr, face_scr, xg, yg, x_row, r_col,
                               sel_row, sel_col, y_top, y_bot, hi,
                               rowwin=rowwin[0], ty_f=ty_f, height=height,
                               dep_scr=dep_scr, tmpd_scr=tmpd_scr,
                               scene_ref=scene_ref, mesh_t=mesh_t,
                               with_depth=with_depth)
                    rr = jnp.where(use_f, face_scr[0], rr)
                    gg = jnp.where(use_f, face_scr[1], gg)
                    bb = jnp.where(use_f, face_scr[2], bb)
                    aa = jnp.where(use_f, face_scr[3], aa)

                # `PSCube.hlsl:57` store-if semantics (see warp.py on
                # the alpha clamp)
                aa = jnp.minimum(aa, 1.0)
                store_ok = (aa > 0.0) & valid
                zero = jnp.zeros_like(aa)
                z_new = jnp.where(store_ok, exit_z, FLT_MAX)
                r_new = jnp.where(store_ok, rr, zero)
                g_new = jnp.where(store_ok, gg, zero)
                b_new = jnp.where(store_ok, bb, zero)
                a_new = jnp.where(store_ok, aa, zero)

                # streaming nearest-K insert, VMEM-resident; skipped
                # when the warp left every pixel transparent. The insert
                # only runs on the static row window covering store_ok's
                # live rows (rows outside would insert z = FLT_MAX — a
                # no-op): ~11 VPU ops x k_layers x (th, tw) per listed
                # volume was tile-height-bound, not footprint-bound.
                def insert(r0: int, sp: int):
                    sl = slice(r0, r0 + sp)
                    zn, rn = z_new[sl], r_new[sl]
                    gn, bn, an = g_new[sl], b_new[sl], a_new[sl]
                    for k in range(k_layers):
                        z_k = layers_scr[0, k, sl]
                        take = zn < z_k
                        layers_scr[0, k, sl] = jnp.where(take, zn, z_k)
                        zn = jnp.where(take, z_k, zn)
                        for ch, new in ((1, rn), (2, gn), (3, bn),
                                        (4, an)):
                            old = layers_scr[ch, k, sl]
                            layers_scr[ch, k, sl] = jnp.where(take, new,
                                                              old)
                            if ch == 1:
                                rn = jnp.where(take, old, new)
                            elif ch == 2:
                                gn = jnp.where(take, old, new)
                            elif ch == 3:
                                bn = jnp.where(take, old, new)
                            else:
                                an = jnp.where(take, old, new)

                @pl.when(jnp.max(store_ok.astype(jnp.int32)) > 0)
                def _():
                    if rowwin[1] and th % 32 == 0:
                        ridx = jax.lax.broadcasted_iota(
                            jnp.int32, (th, tw), 0)
                        r_min = jnp.min(jnp.where(store_ok, ridx, th))
                        r_max = jnp.max(jnp.where(store_ok, ridx, -1))
                        _row_window_variants(r_min, r_max, th, insert,
                                             quarters=True)
                    else:
                        insert(0, th)
            return 0

        @pl.when(count > 0)
        def _():
            start_copies(0, 0)
            jax.lax.fori_loop(0, count, vol_body, 0)

        # front-to-back under-blend (`PSResolveOIT.hlsl:17-24`)
        accr = jnp.zeros((th, tw), jnp.float32)
        accg = jnp.zeros((th, tw), jnp.float32)
        accb = jnp.zeros((th, tw), jnp.float32)
        acca = jnp.zeros((th, tw), jnp.float32)
        for k in range(k_layers):
            tr = 1.0 - acca
            accr = accr + layers_scr[1, k] * tr
            accg = accg + layers_scr[2, k] * tr
            accb = accb + layers_scr[3, k] * tr
            acca = acca + layers_scr[4, k] * tr
        acca = jnp.minimum(acca, 0.9997)
        out_ref[0] = accr
        out_ref[1] = accg
        out_ref[2] = accb
        out_ref[3] = acca

    if with_depth:
        def kernel(tlist, counts, vol_flt, face_flt, row0, color_hbm,
                   depth_hbm, scene_ref, out_ref, vol_scr, dep_scr,
                   tmp_scr, tmpd_scr, face_scr, layers_scr, sem, sem_d):
            body(tlist, counts, vol_flt, face_flt, row0, color_hbm,
                 depth_hbm, scene_ref, out_ref, vol_scr, dep_scr,
                 tmp_scr, tmpd_scr, face_scr, layers_scr, sem, sem_d)
    else:
        def kernel(tlist, counts, vol_flt, face_flt, row0, color_hbm,
                   scene_ref, out_ref, vol_scr, tmp_scr, face_scr,
                   layers_scr, sem):
            body(tlist, counts, vol_flt, face_flt, row0, color_hbm,
                 None, scene_ref, out_ref, vol_scr, None,
                 tmp_scr, None, face_scr, layers_scr, sem, None)
    return kernel


def _face_warp(f, use_f, vid, slot, face_flt, vol_scr, tmp_scr, face_scr,
               xg, yg, x_row, r_col, sel_row, sel_col,
               y_top, y_bot, hi, rowwin=True, ty_f=None, height=None,
               dep_scr=None, tmpd_scr=None, scene_ref=None, mesh_t=None,
               with_depth=False):
    """Exact two-pass projective warp of face f onto the tile, written
    into face_scr (only when any pixel exits through f). with_depth
    adds the CubeCast depth weights on mesh tiles (see _make_kernel)."""
    th, tw = xg.shape
    s = r_col.shape[0]
    u_block = sel_col.shape[1]

    any_f = jnp.max(use_f.astype(jnp.int32)) > 0

    # EVERYTHING else lives under the any_f guard: a convex box exits
    # through <= 3 faces per tile (usually 1-2), and the range math
    # alone is ~25 VPU ops over (s, tw)/(th, tw) grids — running it for
    # the dead faces of every (tile, volume) pair was ~1 ms/frame
    @pl.when(any_f)
    def _():
        pu0 = face_flt[vid, f, 0]
        pu1 = face_flt[vid, f, 1]
        pu2 = face_flt[vid, f, 2]
        pv0 = face_flt[vid, f, 3]
        pv1 = face_flt[vid, f, 4]
        pv2 = face_flt[vid, f, 5]
        dn0 = face_flt[vid, f, 6]
        dn1 = face_flt[vid, f, 7]
        dn2 = face_flt[vid, f, 8]

        # pass-2 coordinate + sweep range (masked by use_f)
        dq = dn0 * xg + dn1 * yg + dn2
        vt = jnp.clip(_finite((pv0 * xg + pv1 * yg + pv2) / _safe(dq)),
                      0.0, hi)
        vt_lo = jnp.clip(jnp.min(jnp.where(use_f, vt, _BIG)), 0.0, hi)
        vt_hi = jnp.clip(jnp.max(jnp.where(use_f, vt, -_BIG)), 0.0, hi)
        v_lo = jnp.floor(vt_lo).astype(jnp.int32)
        # cap at hi: vt <= hi, so row hi+1 would get exactly zero
        # tent weight anyway
        v_hi = jnp.minimum(
            jnp.minimum(jnp.floor(vt_hi).astype(jnp.int32) + 1, s - 1),
            hi.astype(jnp.int32))

        def pass1(use_dep: bool = False):
            """u-sweep pass 1 over the full face-row grid. Static
            face-row windows by n_eff and dynamic 8-aligned windows
            (MV_CKERNEL_SUBGRID) were both built and measured on v5e
            (2026-08): no win — the u-sweep range already tracks the
            footprint (see ARCHITECTURE.md gotchas) — and the dynamic
            variant SIGABRTs Mosaic. Row windowing lives in pass 2 /
            the K-insert, where the static-variant trick applies.
            use_dep additionally u-interpolates the volume's
            unprojected cube depth into tmpd_scr (same tent weights,
            which sum to 1 per row — a true interpolation)."""
            r_c = r_col
            x_r = x_row
            # pass-1 auxiliary (Catmull-Smith): for face row r, the
            # screen y where v(x, y) == r, and the u coordinate there
            k0 = pv0 - r_c * dn0
            k1 = pv1 - r_c * dn1
            k2 = pv2 - r_c * dn2
            y1 = -(k0 * x_r + k2) / _safe(k1)
            dq1 = dn0 * x_r + dn1 * y1 + dn2
            cu = jnp.clip(
                _finite((pu0 * x_r + pu1 * y1 + pu2) / _safe(dq1)),
                0.0, hi)
            # row liveness: the row's isoline must cross the tile AND
            # the row be inside the pass-2 sweep range
            ok1 = ((y1 <= y_top) & (y1 >= y_bot)
                   & (r_c >= v_lo.astype(jnp.float32) - 1.0)
                   & (r_c <= v_hi.astype(jnp.float32) + 1.0))
            cu_lo = jnp.clip(jnp.min(jnp.where(ok1, cu, _BIG)), 0.0, hi)
            cu_hi = jnp.clip(jnp.max(jnp.where(ok1, cu, -_BIG)), 0.0, hi)
            u_lo = jnp.floor(cu_lo).astype(jnp.int32)
            u_hi = jnp.floor(cu_hi).astype(jnp.int32) + 1  # inclusive
            n_ub = (u_hi - u_lo) // u_block + 1

            tmp_scr[:] = jnp.zeros((4, s, tw), jnp.float32)
            img_all = vol_scr[slot, f].reshape(
                4 * s, vol_scr.shape[-1])
            if use_dep:
                tmpd_scr[:] = jnp.zeros((s, tw), jnp.float32)
                dimg = dep_scr[slot, f]

            def u_blk(b, _):
                ub0 = u_lo + b * u_block
                # one-hot (s_pad, u_block) selecting cols [ub0, ub0+B)
                selb = sel_row == ub0 + sel_col
                sel = selb.astype(img_all.dtype)
                cols = jax.lax.dot_general(
                    img_all, sel, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                   # (4*s, u_block)
                acc = tmp_scr[:]
                if use_dep:
                    cols_d = jax.lax.dot_general(
                        dimg, selb.astype(jnp.float32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                               # (s, u_block)
                    accd = tmpd_scr[:]
                for j in range(u_block):
                    u_f = (ub0 + j).astype(jnp.float32)
                    wu = jnp.maximum(1.0 - jnp.abs(cu - u_f), 0.0)
                    colj = cols[:, j:j + 1].reshape(4, s, 1)
                    acc = acc + colj * wu[None]
                    if use_dep:
                        accd = accd + cols_d[:, j:j + 1] * wu
                tmp_scr[:] = acc
                if use_dep:
                    tmpd_scr[:] = accd
                return 0

            jax.lax.fori_loop(0, n_ub, u_blk, 0)

        def pass2(th_sub: int, r0: int, use_dep: bool = False):
            """v-sweep over the STATIC tile-row window [r0, r0 + th_sub).
            Pixels outside use_f never reach the output (the caller's
            select masks them), so a window covering the live rows is
            exact; vt recomputes on the sub-window (xg is
            row-independent, yg is affine in the row index). use_dep
            modulates each v tap by the CubeCast depth weight
            max(1 - 0.5*|sceneDist - tapDist|, 0) (tapDist = the pass-1
            u-interpolated cube depth), normalizing by the weight sum
            with plain-tent fallback where every weight is zero
            (`PSCube.hlsli:104`)."""
            if th_sub == th:
                vt_w = vt
                scene_w = scene_ref[...] if use_dep else None
            else:
                rows = (jax.lax.broadcasted_iota(
                    jnp.int32, (th_sub, tw), 0).astype(jnp.float32)
                    + jnp.float32(r0))
                yg_w = -((ty_f + rows + 0.5) / height * 2.0 - 1.0)
                # xg is row-constant (lane iota), so Mosaic stores it
                # sublane-REPLICATED (vreg-grid row extent 1): a row
                # slice xg[:th_sub] asks ApplyVectorLayout for th_sub/8
                # vreg rows from 1 and SIGABRTs ("limits[i] <= dim(i)
                # (4 vs. 1)", v5e 2026-08-20). Broadcast row 0 instead —
                # bit-identical values, replication-preserving.
                xg_w = jnp.broadcast_to(xg[0:1], (th_sub, tw))
                dq_w = dn0 * xg_w + dn1 * yg_w + dn2
                vt_w = jnp.clip(
                    _finite((pv0 * xg_w + pv1 * yg_w + pv2) / _safe(dq_w)),
                    0.0, hi)
                scene_w = (scene_ref[r0:r0 + th_sub, :]
                           if use_dep else None)
            if use_dep:
                # clip z -> view distance (`UnprojectZ`, PSCube.hlsli)
                zn, zf = _Z_NEAR, _Z_FAR
                d_w = (zn * zf) / (scene_w * (zn - zf) + zf)

            def v_step(v, carry):
                wv = jnp.maximum(
                    1.0 - jnp.abs(vt_w - v.astype(jnp.float32)), 0.0)
                # FOUR 2-D (1, tw) loads, NOT one (4, 1, tw) load +
                # row[ch] extracts: the 3-D minor-dim-1 vector extract
                # SIGABRTs Mosaic's ApplyVectorLayout inside the row
                # window's pl.when nest (vector_extract_strided_slice,
                # "limits[i] <= dim(i) (4 vs. 1)", v5e 2026-08-20)
                row = [tmp_scr[ch, pl.ds(v, 1), :] for ch in range(4)]
                fr, fg, fb, fa, *gs_t = carry
                if use_dep:
                    # weight FLOOR instead of a separate plain
                    # accumulation for the zero-weight fallback
                    # (`PSCube.hlsli:104`): with w = wv * max(wd, 1e-6),
                    # the normalized sum equals the (normalized) plain
                    # tent exactly when every tap's depth weight is
                    # zero, and the floor taps contribute ~1e-6 relative
                    # mass otherwise. 5 accumulators instead of 9 — the
                    # mesh tiles this branch runs on are the kernel's
                    # LONGEST tiles (central, most volumes), so pass-2
                    # FMA count there is headline time.
                    drow = tmpd_scr[pl.ds(v, 1), :]  # (1, tw)
                    wd = jnp.maximum(1.0 - 0.5 * jnp.abs(d_w - drow), 0.0)
                    wv = wv * jnp.maximum(wd, 1e-6)
                fr = fr + row[0] * wv
                fg = fg + row[1] * wv
                fb = fb + row[2] * wv
                fa = fa + row[3] * wv
                if use_dep:
                    return fr, fg, fb, fa, gs_t[0] + wv
                return fr, fg, fb, fa

            zero = jnp.zeros((th_sub, tw), jnp.float32)
            init = (zero,) * (5 if use_dep else 4)
            out = jax.lax.fori_loop(v_lo, v_hi + 1, v_step, init)
            if use_dep:
                fr, fg, fb, fa, gs = out
                # normalize (tent sums are ~1 interior; the floor makes
                # gs > 0 wherever any tent tap landed)
                inv = 1.0 / jnp.maximum(gs, 1e-20)
                fr, fg, fb, fa = fr * inv, fg * inv, fb * inv, fa * inv
            else:
                fr, fg, fb, fa = out
            face_scr[0, r0:r0 + th_sub, :] = fr
            face_scr[1, r0:r0 + th_sub, :] = fg
            face_scr[2, r0:r0 + th_sub, :] = fb
            face_scr[3, r0:r0 + th_sub, :] = fa

        def run_pass2(use_dep: bool):
            if rowwin and th % 32 == 0:
                # live tile-row range of this face's pixels -> one
                # static half/full row window (quarter windows skipped:
                # pass 2's body is large and the variant count doubles)
                # full-(th, tw) iota + reduce, NOT a (th, 1) keepdims
                # reduction: minor-dim-1 vectors are a Mosaic lowering
                # hazard (docs/ARCHITECTURE.md gotchas), and this matches
                # the insert site's formulation
                ridx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
                r_min = jnp.min(jnp.where(use_f, ridx, th))
                r_max = jnp.max(jnp.where(use_f, ridx, -1))
                _row_window_variants(
                    r_min, r_max, th,
                    lambda r0, sp: pass2(sp, r0, use_dep),
                    quarters=False)
            else:
                pass2(th, 0, use_dep)

        if with_depth:
            # depth weighting only where a seam can exist: tiles without
            # a mesh pixel would zero every weight and fall back anyway
            @pl.when(mesh_t)
            def _():
                pass1(True)
                run_pass2(True)

            @pl.when(~mesh_t)
            def _():
                pass1(False)
                run_pass2(False)
        else:
            pass1(False)
            run_pass2(False)


@functools.partial(
    jax.jit,
    static_argnames=("s", "th", "tw", "tiles_x", "k_layers",
                     "width", "height", "interpret"),
)
def tile_composite_pallas(
    color_sel,    # (N, 6, 4, S, S_pad) pre-swapped, minor-padded faces
    scene_z,      # (Hp, Wp) padded scene clip depth (0 in the pad)
    tlist,        # (T, N) int32 per-tile volume ids (first `counts` valid)
    counts,       # (T,) int32
    vol_flt,      # (N, 21) f32: b_mat 9, eye_local 3, wvp col2 4,
                  #   wvp col3 4, n_eff 1
    face_flt,     # (N, 6, 9) f32: pu(3), pv(3), den(3) texel-scaled,
                  #   Catmull-Smith-swapped
    s: int,
    th: int,
    tw: int,
    tiles_x: int,
    k_layers: int,
    width: int,   # UNPADDED screen dims (NDC mapping)
    height: int,
    interpret: bool | None = None,
    tile_row0=None,  # (1,) int32 global tile-row offset (row sharding)
    depth_sel=None,  # (N, 6, S, S_pad) f32 UNPROJECTED cube depth —
                     # enables the CubeCast depth weights (mesh scenes)
):
    """-> (4, Hp, Wp) premultiplied under-blended RGBA (crop to H, W)."""
    if interpret is None:
        interpret = interpret_default()
    n = color_sel.shape[0]
    s_pad = color_sel.shape[-1]
    hp, wp = scene_z.shape
    tiles = (hp // th) * (wp // tw)
    assert tiles == tlist.shape[0]
    if tile_row0 is None:
        tile_row0 = jnp.zeros((1,), jnp.int32)
    with_depth = depth_sel is not None

    # MXU column-hoist width (A/B knob): wider = fewer tiny one-hot
    # matmul dispatches per u-sweep, same total FMA work. PROCESS-LEVEL:
    # read at trace time inside the jit cache — set it before the first
    # frame and A/B in separate processes (an in-process change after
    # tracing is silently ignored).
    import os

    u_block = int(os.environ.get("MV_CKERNEL_UBLOCK", "8"))
    # MV_CKERNEL_ROWWIN=0 drops the STATIC pass-2/K-insert row windows
    # back to full-tile sweeps (A/B escape hatch, same process-level
    # rule). Default ON: the windows are `pl.when`-selected static
    # (start, span) pairs (_row_window_variants) — the lowering shape
    # Mosaic accepts, replacing the dynamic-offset MV_CKERNEL_SUBGRID
    # experiment that SIGABRTed v5e ("Check failed: limits[i] <=
    # dim(i)", 2026-08, pl.multiple_of hints included; knob deleted).
    # "p2"/"ins" enable only one of the two window sites (pass-2 face
    # sweep / nearest-K insert) — the Mosaic-SIGABRT bisection handles
    _rw = os.environ.get("MV_CKERNEL_ROWWIN", "1")
    rowwin_p2 = _rw in ("1", "p2")
    rowwin_ins = _rw in ("1", "ins")
    # MV_CKERNEL_DMAEXT=1 enables per-volume n_eff-extent face DMA
    # (same process-level rule). Default OFF: measured NEUTRAL on v5e
    # (4.9 ms either way at the 64-volume demo — the double-buffered
    # full-slab copy is already hidden under compute), and the variant
    # predicates add per-volume branches. Kept as a knob: on a
    # DMA-bound scene (many tiny volumes per tile) the 4x byte cut is
    # real; equality tests cover the path in interpret mode.
    dma_ext = os.environ.get("MV_CKERNEL_DMAEXT", "0") == "1"
    # MV_CKERNEL_DEPTHW=0 drops the CubeCast depth weights back to the
    # plain tent (A/B + seam-test escape hatch, same process-level rule)
    if os.environ.get("MV_CKERNEL_DEPTHW", "1") == "0":
        with_depth = False
    kernel = _make_kernel(n, s, s_pad, th, tw, tiles_x, k_layers,
                          width, height, u_block=u_block,
                          rowwin=(rowwin_p2, rowwin_ins),
                          with_depth=with_depth, dma_ext=dma_ext)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),      # face images (HBM)
    ]
    if with_depth:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # cube depth
    in_specs.append(
        pl.BlockSpec((th, tw),
                     lambda i, *_: (i // tiles_x, i % tiles_x),
                     memory_space=pltpu.VMEM))  # scene depth tile
    scratch = [pltpu.VMEM((2, 6, 4, s, s_pad), color_sel.dtype)]  # 2 slots
    if with_depth:
        scratch.append(pltpu.VMEM((2, 6, s, s_pad), jnp.float32))
    scratch.append(pltpu.VMEM((4, s, tw), jnp.float32))   # pass-1 tmp
    if with_depth:
        scratch.append(pltpu.VMEM((s, tw), jnp.float32))  # pass-1 depth
    scratch += [
        pltpu.VMEM((4, th, tw), jnp.float32),     # per-face result
        pltpu.VMEM((5, k_layers, th, tw), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if with_depth:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (4, th, tw), lambda i, *_: (0, i // tiles_x, i % tiles_x),
            memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )

    operands = [tlist, counts, vol_flt, face_flt, tile_row0, color_sel]
    if with_depth:
        operands.append(depth_sel)
    operands.append(scene_z)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(*operands)
