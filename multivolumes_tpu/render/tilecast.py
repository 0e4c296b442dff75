"""Host-side prep for the Pallas screen-tile OIT composite.

Drop-in alternative to `warp.composite_oit_warp` (same output contract:
premultiplied under-blended (r, g, b, a) screen fields; reference anchor
`PSCube.hlsli` + `PSDepthPeel.hlsl` + `PSResolveOIT.hlsl`). This module
does the per-frame XLA-side geometry — per-volume homographies, the
Catmull-Smith orientation choice, per-tile volume lists — and hands the
pixel work to `ops/pallas/composite_kernel.py`.

vs the warp module's per-volume scan:
  * cost is per-(tile, overlapping volume), angle-INDEPENDENT — there is
    no rectified/dense `lax.cond` (which doubled the composite graph and
    its fresh-compile time, docs/ROADMAP.md);
  * pass 2 is the exact dense warp (no anchor-correction approximation);
  * the K-buffer never round-trips HBM per volume (the ~10k-tiny-copy
    trace finding).

The warp module remains the XLA semantics twin for tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multivolumes_tpu.core import math3d
from multivolumes_tpu.ops.pallas.composite_kernel import tile_composite_pallas
from multivolumes_tpu.render import warp as warp_lib
from multivolumes_tpu.render.cull import CullResult
from multivolumes_tpu.render.perframe import PerObject


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def tile_dims(width: int, height: int):
    """Tile shape + padded screen dims (tiles are (th, tw) exactly).

    MV_TILE_H / MV_TILE_W override the defaults (A/B knob): smaller
    tiles track each volume's true footprint tighter (the kernel's
    sweep grids and K-insert run over whole tiles) at the price of
    re-DMAing a volume's faces for more tiles. PROCESS-LEVEL: read at
    trace time — set before the first frame; A/B in separate
    processes.

    Defaults from the measured v5e A/B matrix at the 64-volume demo
    (docs/ARCHITECTURE.md "Tile-composite A/B matrix", 2026-08-19):
    64x128 tiles 4.4 ms vs 128x256's 7.6 — footprint tracking beats
    face-DMA reuse down to 64 rows, and reverses below (32x128:
    8.8 ms, the re-fetch bill)."""
    import os

    tw = 128
    th = 64 if height > 64 else _ceil_to(max(height, 8), 8)
    tw = _ceil_to(int(os.environ.get("MV_TILE_W", tw)), 128)
    th = _ceil_to(int(os.environ.get("MV_TILE_H", th)), 8)
    wp = _ceil_to(width, tw)
    hp = _ceil_to(height, th)
    return th, tw, hp, wp


def composite_oit_tile(
    cube_maps,                      # color (N, 6, 4, S, S) UNPACKED
    per_object: PerObject,
    cull: CullResult,
    eye,
    screen_to_world,
    depth_map,                      # (H, W) scene clip depth or None
    width: int,
    height: int,
    num_layers: int,
    interpret: bool | None = None,
    order=None,                     # (N,) int32: cube_maps rows are in
                                    # this bucket-sorted volume order
                                    # (sweep sorted_output=True)
    swap_sorted=None,
):
    """Full OIT composite via the screen-tile kernel -> (r, g, b, a)."""
    prep = _tile_prep(cube_maps, per_object, cull, eye, screen_to_world,
                      depth_map, width, height, num_layers=num_layers,
                      order=order, swap_sorted=swap_sorted)
    (color_sel, depth_sel, scene_p, tlist, counts, vol_flt, face_flt,
     s, th, tw, tiles_x, k_layers) = prep
    out = tile_composite_pallas(
        color_sel, scene_p, tlist, counts, vol_flt, face_flt,
        s=s, th=th, tw=tw, tiles_x=tiles_x, k_layers=k_layers,
        width=width, height=height, interpret=interpret,
        depth_sel=depth_sel,
    )
    out = out[:, :height, :width]
    return out[0], out[1], out[2], out[3]


def composite_oit_tile_sharded(
    mesh,                           # jax.sharding.Mesh with a "rows" axis
    cube_maps,
    per_object: PerObject,
    cull: CullResult,
    eye,
    screen_to_world,
    depth_map,
    width: int,
    height: int,
    num_layers: int,
    interpret: bool | None = None,
    order=None,
    swap_sorted=None,
):
    """Row-sharded screen composite: each device runs the tile kernel on
    a contiguous band of tile rows (SURVEY section-2.6's screen-space
    data-parallel axis). The per-tile prep stays replicated (it is
    per-volume geometry, a few KB); inputs are the post-all-gather
    replicated cube maps, so the only sharded tensors are the scene
    depth band and the output band — zero extra collectives."""
    from jax.sharding import PartitionSpec as P

    rows = mesh.shape["rows"]
    prep = _tile_prep(cube_maps, per_object, cull, eye, screen_to_world,
                      depth_map, width, height, rows_mult=rows,
                      num_layers=num_layers, order=order,
                      swap_sorted=swap_sorted)
    (color_sel, depth_sel, scene_p, tlist, counts, vol_flt, face_flt,
     s, th, tw, tiles_x, k_layers) = prep
    ty_local = (scene_p.shape[0] // th) // rows

    def local_fn(tl, cn, sz, cs, vf, ff, *ds):
        r = jax.lax.axis_index("rows")
        off = (r * ty_local).astype(jnp.int32)[None]
        return tile_composite_pallas(
            cs, sz, tl, cn, vf, ff, s=s, th=th, tw=tw, tiles_x=tiles_x,
            k_layers=k_layers, width=width, height=height,
            interpret=interpret, tile_row0=off,
            depth_sel=ds[0] if ds else None,
        )

    args = (tlist, counts, scene_p, color_sel, vol_flt, face_flt)
    specs = (P("rows"), P("rows"), P("rows"), P(), P(), P())
    if depth_sel is not None:
        args += (depth_sel,)
        specs += (P(),)  # replicated like the faces (post-all-gather)
    out = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=specs,
        out_specs=P(None, "rows", None),
        check_vma=False,
    )(*args)
    out = out[:, :height, :width]
    return out[0], out[1], out[2], out[3]


def _tile_prep(
    cube_maps,
    per_object: PerObject,
    cull: CullResult,
    eye,
    screen_to_world,
    depth_map,
    width: int,
    height: int,
    rows_mult: int = 1,             # pad tile rows to this multiple
    num_layers: int = 8,
    order=None,
    swap_sorted=None,               # (N, 6) bool: maps arrive pre-swapped
                                    # (sweep swap_basis), depth
                                    # pre-unprojected; rows sorted-space
):
    """Per-frame host-side geometry for the tile kernel (docstring at
    module top)."""
    if order is not None:
        # the sweep delivered bucket-SORTED map rows (row j = volume
        # order[j], sweep.ray_march_view_sweep_lod sorted_output) so its
        # assembly could be static update-slices instead of scatters;
        # permute the small per-volume tensors into the same space and
        # every id below is a sorted-space id — the kernel never cares
        per_object = PerObject(*(x[order] for x in per_object))
        cull = CullResult(*(x[order] for x in cull))
    color = cube_maps.color
    assert color.shape[2] == 4, "tile composite needs unpacked cube maps"
    n = per_object.world.shape[0]
    s = color.shape[-1]
    k_layers = min(num_layers, n)

    a_mat = warp_lib.screen_basis(screen_to_world, eye)       # (3, 3)
    eye_local = math3d.transform_point3(eye, per_object.world_i)  # (N, 3)
    wi3 = per_object.world_i[:, :3, :3]
    b_mat = jnp.einsum("ij,njk->nik", a_mat, wi3)             # (N, 3, 3)
    # floor at 1: the kernel's face DMA is predicated on n_eff > 0 (its
    # extent variant select, composite_kernel._variant) — an n_eff of 0
    # (a caller passing mip_level >= log2(s)) would skip the copy and
    # composite the previous volume's stale VMEM slot; and the sweep
    # clip hi = n_eff - 1 must stay >= 0
    n_eff = jnp.maximum(
        s >> jnp.clip(cull.mip_level, 0, 31), 1).astype(jnp.float32)

    # --- per-(volume, face) homographies + Catmull-Smith orientation ----
    # swap decision at the volume's projected centre (same granularity as
    # the warp path's tile centre — the tile there is centred on the
    # volume); in NDC via the clip image of the local origin.
    # swap_sorted (from the sweep's swap_basis assembly) means the maps
    # arrive PRE-swapped (+ depth pre-unprojected): use the sweep's own
    # flags verbatim so homography rows and face images can never
    # disagree, and skip the (N, 6, 4, S, S) re-materialization.
    pre_swapped = swap_sorted is not None
    swap_nf = (swap_sorted if pre_swapped
               else warp_lib.catmull_swap_flags(
                   a_mat, per_object.world_i, per_object.world_view_proj,
                   eye_local, n_eff))                         # (N, 6)

    pu_f, pv_f, dn_f = [], [], []
    for f in range(6):
        nu, nv, den = jax.vmap(
            lambda b, o, f=f: warp_lib.face_homography(b, o, f)
        )(b_mat, eye_local)                                   # (N, 3) each
        p_u = n_eff[:, None] * nu - 0.5 * den
        p_v = n_eff[:, None] * nv - 0.5 * den
        swap = swap_nf[:, f]
        pu_f.append(jnp.where(swap[:, None], p_v, p_u))
        pv_f.append(jnp.where(swap[:, None], p_u, p_v))
        dn_f.append(den)

    face_flt = jnp.stack(
        [jnp.concatenate([pu_f[f], pv_f[f], dn_f[f]], axis=1)
         for f in range(6)], axis=1)                          # (N, 6, 9)

    # pre-swapped face images (a swapped face samples the transposed
    # image), minor-padded to the lane width; kept in the sweep's
    # compute dtype (bf16) — the kernel's one-hot column hoists are
    # MXU matmuls with f32 accumulation, so precision matches the
    # sweep's own output path while halving the per-volume DMA
    s_pad = _ceil_to(s, 128)
    if pre_swapped:
        color_sel = color
    else:
        color_t = jnp.swapaxes(color, -1, -2)
        color_sel = jnp.where(
            swap_nf[:, :, None, None, None], color_t, color)
    if s_pad != s:
        color_sel = jnp.pad(
            color_sel, ((0, 0),) * 4 + ((0, s_pad - s),))

    # cube DEPTH plane for the CubeCast weights (`PSCube.hlsli:51-108`)
    # — only when a scene depth exists (no mesh -> every weight would be
    # zero and the kernel's fallback reproduces the plain tent exactly).
    # Pre-UNPROJECTED to view distance (f32: clip z near 1 unprojects
    # with a ~1e4 gain, so a bf16 clip store would corrupt the weights),
    # swapped/padded exactly like the color faces. Under pre_swapped the
    # sweep assembly already delivered view-distance swapped planes.
    depth_sel = None
    if depth_map is not None and cube_maps.depth is not None:
        if pre_swapped:
            depth_sel = cube_maps.depth
        else:
            from multivolumes_tpu.render.composite import unproject_z

            dep = unproject_z(cube_maps.depth.astype(jnp.float32))
            dep_t = jnp.swapaxes(dep, -1, -2)
            depth_sel = jnp.where(swap_nf[:, :, None, None], dep_t, dep)
        if s_pad != s:
            depth_sel = jnp.pad(
                depth_sel, ((0, 0),) * 3 + ((0, s_pad - s),))

    # --- per-volume scalars ---------------------------------------------
    wvp = per_object.world_view_proj                          # (N, 4, 4)
    vol_flt = jnp.concatenate([
        b_mat.reshape(n, 9),
        eye_local,
        wvp[:, :, 2],
        wvp[:, :, 3],
        n_eff[:, None],
    ], axis=1)                                                # (N, 21)

    # --- per-tile volume lists (bbox culled, capacity N) ----------------
    th, tw, hp, wp = tile_dims(width, height)
    if rows_mult > 1:
        hp = _ceil_to(hp, th * rows_mult)  # even tile-row bands per device
    tiles_x = wp // tw
    tiles_y = hp // th
    tiles = tiles_x * tiles_y

    corners = jnp.asarray(
        [[x, y, z] for x in (-1.0, 1.0) for y in (-1.0, 1.0)
         for z in (-1.0, 1.0)], jnp.float32)
    ch_ = math3d.transform_point(corners[None], wvp[:, None])  # (N, 8, 4)
    cok = ch_[..., 3] > 1e-3
    chw = jnp.maximum(ch_[..., 3], 1e-3)
    px = (ch_[..., 0] / chw * 0.5 + 0.5) * width
    py = (-ch_[..., 1] / chw * 0.5 + 0.5) * height
    big = jnp.float32(1e9)
    # any behind-camera corner projects garbage: treat the bbox as
    # full-screen for that volume (conservative — never cull wrongly)
    all_ok = jnp.all(cok, axis=-1)
    vx_lo = jnp.where(all_ok, jnp.min(px, -1), -big)
    vx_hi = jnp.where(all_ok, jnp.max(px, -1), big)
    vy_lo = jnp.where(all_ok, jnp.min(py, -1), -big)
    vy_hi = jnp.where(all_ok, jnp.max(py, -1), big)

    t_idx = jnp.arange(tiles, dtype=jnp.int32)
    tx0 = (t_idx % tiles_x * tw).astype(jnp.float32)          # (T,)
    ty0 = (t_idx // tiles_x * th).astype(jnp.float32)
    overlap = (
        (vx_lo[None, :] < tx0[:, None] + tw)
        & (vx_hi[None, :] > tx0[:, None])
        & (vy_lo[None, :] < ty0[:, None] + th)
        & (vy_hi[None, :] > ty0[:, None])
        & cull.visible[None, :]
    )                                                         # (T, N)
    vids = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(overlap, vids[None], n + 1)
    tlist = jnp.sort(key, axis=1).astype(jnp.int32)           # (T, N)
    tlist = jnp.minimum(tlist, n - 1)  # sentinel slots never looped over
    counts = jnp.sum(overlap, axis=1).astype(jnp.int32)       # (T,)

    scene = depth_map if depth_map is not None else jnp.ones(
        (height, width), jnp.float32)
    # pad with 0: exit_z <= 0 never passes, so pad pixels stay empty
    scene_p = jnp.pad(scene, ((0, hp - height), (0, wp - width)))

    return (color_sel, depth_sel, scene_p, tlist, counts, vol_flt,
            face_flt, s, th, tw, tiles_x, k_layers)
