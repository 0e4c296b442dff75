"""The frame graph: one pure jitted function per frame.

Equivalent of `MultiVolumes::PopulateCommandList` + `MultiRayCaster::Render`
(`MultiVolumes.cpp:615-692`, `MultiRayCaster.cpp:355-385`), with XLA
dataflow in place of the reference's ~40 resource barriers, ExecuteIndirect
round-trips and fences:

    shadow map -> mesh depth/base pass -> sky -> volume cull ->
    light-space march (1 volume/frame) -> view-space cube-map march ->
    OIT composite -> TAA -> tone map

Returns the display image and the advanced SceneState (light maps, TAA
history, frame index) — the whole engine is `(state, camera) -> (image,
state)`. Screen-space data flows between passes as per-channel scalar
fields (see render/raymarch.py for the TPU layout rule); the (H, W, 3)
image is assembled once at the boundary.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from multivolumes_tpu.config import RenderConfig
from multivolumes_tpu.core.camera import Camera
from multivolumes_tpu.render import composite, postprocess
from multivolumes_tpu.render import cull as cull_lib
from multivolumes_tpu.render import lightmarch
from multivolumes_tpu.render import raymarch
from multivolumes_tpu.render import taa as taa_lib
from multivolumes_tpu.render import mesh as mesh_lib
from multivolumes_tpu.render.perframe import build_per_object
from multivolumes_tpu.scene.state import SceneState


class FrameOutput(NamedTuple):
    image: jnp.ndarray       # (H, W, 3) display-mapped
    hdr: jnp.ndarray         # (H, W, 4) pre-tonemap scene color
    state: SceneState


def render_frame(
    state: SceneState,
    camera: Camera,
    config: RenderConfig,
    show_mesh: Optional[bool] = None,
    use_taa: bool = True,
    mesh: object = None,  # jax.sharding.Mesh: partition the view sweep
                          # over the volume axis (parallel/sharding.py)
    planar: bool = False,  # emit image/hdr channel-LEADING (3/4, H, W):
                           # a channel-last minor dim lane-pads 42x on
                           # TPU (docs/ARCHITECTURE.md), so the
                           # throughput path (render_frames) keeps the
                           # jit boundary planar and converts on host
    precomp=None,          # (per_object, cull, lod_order) computed
                           # OUTSIDE a K-frame scan: cameras are known
                           # upfront, so render_frames vmaps this
                           # small-op prep chain across K instead of
                           # re-running it serially inside every scan
                           # iteration (per-frame "prep" glue)
) -> FrameOutput:
    width, height = config.width, config.height
    show_mesh = config.show_mesh if show_mesh is None else show_mesh

    view_proj = camera.view_proj
    screen_to_world = camera.screen_to_world
    eye = camera.eye

    # every pass body runs under a jax.named_scope: the scope lands in
    # each HLO op's metadata op_name, so a device trace aggregates
    # per-pass IN-FRAME (tools/trace_ops.py --by-pass) — the instrument
    # of record for pass attribution (bench's standalone-jit pass
    # breakdown measures a different compilation context)
    if precomp is not None:
        per_object, cull_pre, order_pre = precomp
    else:
        with jax.named_scope("prep"):
            per_object = build_per_object(state.volume_worlds, view_proj)
        cull_pre = order_pre = None

    # --- opaque mesh: shadow + depth + base pass -------------------------
    has_mesh = bool(show_mesh and state.mesh_indices.shape[0] > 1)
    if has_mesh:
        with jax.named_scope("mesh"):
            mesh_out = mesh_lib.render_mesh(state, camera, config,
                                            device_mesh=mesh)
        depth_map = mesh_out.depth
        shadow_map = mesh_out.shadow
        shadow_vp = mesh_out.shadow_vp
        mesh_rgb = mesh_out.color
        mesh_valid = mesh_out.valid
        velocity = mesh_out.velocity
        new_prev_wvp = mesh_out.new_prev_wvp
    else:
        depth_map = None  # statically skips every occlusion/shadow tap
        shadow_map = None
        shadow_vp = mesh_lib.shadow_view_proj(state)
        mesh_rgb = None
        mesh_valid = None
        velocity = None  # nothing writes velocity -> TAA skips reprojection
        new_prev_wvp = state.mesh_prev_wvp

    # --- volume culling / LOD -------------------------------------------
    if cull_pre is not None:
        cull = cull_pre
    else:
        with jax.named_scope("prep"):
            cull = cull_lib.cull_volumes(
                per_object,
                eye,
                jnp.array([width, height], jnp.float32),
                config.max_ray_samples,
                config.cube_map_size,
                config.num_cube_mips,
                adaptive=config.adaptive_raymarch,
            )

    # --- light-space march ------------------------------------------------
    n_vols = config.num_volumes
    dtype = jnp.bfloat16 if config.use_bf16 else jnp.float32
    if config.light_mode == "sweep" and not config.point_light:
        from multivolumes_tpu.render import lightsweep
        from multivolumes_tpu.render import sweep as sweep_lib

        # Temporal amortization (the reference's 1-volume/frame RayMarchL
        # round-robin, here config.light_refresh per frame): only the
        # cohort's maps are marched + re-oriented; the rest carry over
        # from state. Inter-volume occlusion stays exact through the
        # cached outgoing footprints (position-independent — see
        # lightsweep.light_transmittance).
        c = n_vols if config.light_refresh <= 0 else min(
            config.light_refresh, n_vols)
        ids = jnp.mod(
            state.frame_idx * c + jnp.arange(c, dtype=jnp.int32), n_vols
        ).astype(jnp.int32)
        with jax.named_scope("light"):
            maps_c, light_sout = lightsweep.ray_march_light_sweep_update(
                state.rho_light,
                state.ao_static,
                state.grad_dir,
                state.vol_tex_ids,
                per_object,
                shadow_map,
                shadow_vp,
                state.light_pos,
                state.light_color,
                state.ambient,
                state.sh_coeffs,
                config.max_light_samples,
                has_light_probe=config.has_light_probe,
                sub_ids=ids,
                sout_cache=state.light_sout,
                shadow_quads=(state.mesh_shadow_quads
                              if shadow_map is not None else None),
                static_axis=config.light_axis,
            )
            light_maps = state.light_maps.at[ids].set(
                maps_c.astype(state.light_maps.dtype))
        with jax.named_scope("orient"):
            # the carried stack is lane-padded (sweep.pad_light_lanes):
            # pad the refreshed cohort to match the in-place update
            light_oriented = state.light_maps_oriented.at[ids].set(
                sweep_lib.pad_light_lanes(sweep_lib.orient_variants_cf(
                    maps_c.astype(state.light_maps_oriented.dtype))))
    else:
        # reference semantics: gather march, one volume per frame
        with jax.named_scope("light"):
            light_maps = lightmarch.ray_march_light(
                state.volumes,
                state.vol_tex_ids,
                state.light_maps,
                per_object,
                cull,
                state.frame_idx,
                shadow_map,
                shadow_vp,
                state.light_pos,
                state.light_color,
                state.ambient,
                state.sh_coeffs,
                config.max_light_samples,
                has_light_probe=config.has_light_probe,
                point_light=config.point_light,
            )
        light_oriented = None  # reference path: orient on demand below
        light_sout = state.light_sout

    # --- view-space cube-map march ---------------------------------------
    if config.march_mode == "sweep":
        from multivolumes_tpu.render import sweep as sweep_lib

        # the sweep marches every visible volume at full resolution; the
        # adaptive per-pixel scheme is unnecessary (and would cost a 4M-ray
        # gather march), so all volumes ride the cube-map path — the
        # reference's non-adaptive mode (`CSVolumeCull.hlsl:69`).
        cull_for_composite = cull._replace(
            mip_level=jnp.zeros_like(cull.mip_level),
            use_cube_map=cull.visible,
        )
        use_raycast = False
        # "auto" -> the Pallas screen-tile kernel; "warp" keeps the XLA
        # rectified-warp twin; "gather" the per-pixel CubeCast path
        use_warp = config.composite_mode in ("auto", "warp", "tile")
        use_tile = config.composite_mode in ("auto", "tile")
        lod_order = lod_buckets = sweep_order = None
        sweep_swap = None
        if use_tile:
            # tile path: the sweep emits faces pre-swapped for the
            # composite (and depth pre-unprojected) so the tile prep
            # never re-materializes the (N, 6, 4, S, S) stack; the
            # returned flags feed the prep's homography rows
            from multivolumes_tpu.render import warp as warp_swp

            swap_basis = warp_swp.screen_basis(screen_to_world, eye)
        else:
            swap_basis = None
        vol_or = state.volumes_oriented.astype(dtype)
        light_w = config.light_grid_size  # true u extent of the padded stack
        if light_oriented is not None:
            lm_or = light_oriented.astype(dtype)  # carried; cohort-updated
        else:
            lm_or = sweep_lib.pad_light_lanes(
                sweep_lib.orient_variants_cf(light_maps.astype(dtype)))
        if config.lod_bucket_caps is not None and config.adaptive_raymarch:
            # bucket assignment needs the real projected mips; the sweep
            # itself marches every visible face (use_cube_map forced on
            # via run_mask from visibility)
            lod_cull = cull._replace(use_cube_map=cull.visible)
            # the tile composite consumes bucket-SORTED map rows (static
            # update-slice assembly, no per-volume scatter loop); the
            # warp/gather twins keep original volume indexing
            if mesh is not None:
                with jax.named_scope("sweep"):
                    out = sweep_lib.ray_march_view_sweep_lod_sharded(
                        mesh,
                        vol_or,
                        state.vol_tex_ids,
                        lm_or,
                        per_object,
                        lod_cull,
                        eye,
                        depth_map,
                        config.cube_map_size,
                        dtype=dtype,
                        bucket_caps=config.lod_bucket_caps,
                        pack=not use_warp,
                        light_w=light_w,
                        vol_zmax=state.vol_zmax,
                        sorted_output=use_tile,
                        light_sharded=config.shard_light_stacks,
                        swap_basis=swap_basis,
                    )
            else:
                with jax.named_scope("sweep"):
                    out = sweep_lib.ray_march_view_sweep_lod(
                        vol_or,
                        state.vol_tex_ids,
                        lm_or,
                        per_object,
                        lod_cull,
                        eye,
                        depth_map,
                        config.cube_map_size,
                        dtype=dtype,
                        bucket_caps=config.lod_bucket_caps,
                        pack=not use_warp,
                        light_w=light_w,
                        vol_zmax=state.vol_zmax,
                        sorted_output=use_tile,
                        order=order_pre,
                        swap_basis=swap_basis,
                    )
            if use_tile:
                cube_maps, sweep_mips, sweep_order, sweep_swap = out
            else:
                (cube_maps, sweep_mips), sweep_order = out, None
            cull_for_composite = cull_for_composite._replace(
                mip_level=sweep_mips
            )
            # same pure function the LOD sweep used — the composite's
            # footprint classes mirror the sweep's buckets
            with jax.named_scope("prep"):
                lod_order, lod_buckets = sweep_lib.lod_partition(
                    lod_cull, config.num_volumes, config.cube_map_size,
                    config.lod_bucket_caps,
                )
            if order_pre is not None:
                lod_order = order_pre  # batched-prep scan: reuse; the
                # argsort above is dead code XLA removes
        else:
            with jax.named_scope("sweep"):
                cube_maps = sweep_lib.ray_march_view_sweep(
                    vol_or,
                    state.vol_tex_ids,
                    lm_or,
                    per_object,
                    cull_for_composite,
                    eye,
                    depth_map,
                    config.cube_map_size,
                    num_planes=config.sweep_planes,
                    dtype=dtype,
                    light_w=light_w,
                    vol_zmax=state.vol_zmax,
                )
        if (config.packed_composite and not use_warp
                and cube_maps.color.shape[2] == 4):
            cube_maps = cube_maps._replace(
                color=composite.pack_cube_f16(cube_maps.color)
            )
        if use_warp and cube_maps.color.shape[2] == 2:
            # packed maps can only reach the warp from explicit callers;
            # the warp's matmuls need plain channels
            cube_maps = cube_maps._replace(
                color=composite.unpack_cube_f16(cube_maps.color, dtype)
            )
    else:
        use_warp = False  # the raycast fallback needs the gather composite
        use_tile = False
        with jax.named_scope("sweep"):
            cube_maps = raymarch.ray_march_view(
                state.volumes,
                state.vol_tex_ids,
                jnp.moveaxis(light_maps, 1, -1),  # golden path: channel-last
                per_object,
                cull,
                eye,
                depth_map,
                config.cube_map_size,
                config.max_ray_samples,
                adaptive=config.adaptive_raymarch,
            )
        cull_for_composite = cull
        use_raycast = True

    if config.debug_finite:
        # debug-mode sentinel at the first bf16 accumulation point (the
        # sweep's exp2/log2 opacity math): an Inf in a source volume or
        # light map surfaces HERE with a named error instead of
        # propagating to the screen. Requires the checkify-wrapped step
        # (engine.render builds it when the flag is on).
        from jax.experimental import checkify

        checkify.check(
            jnp.all(jnp.isfinite(cube_maps.color.astype(jnp.float32))),
            "view-space march produced non-finite cube maps",
        )

    # --- background: sky behind mesh -------------------------------------
    with jax.named_scope("sky"):
        sky_r, sky_g, sky_b = postprocess.render_environment(
            state.radiance, screen_to_world, eye, width, height,
            scale=config.sky_scale,
        )
    if mesh_rgb is not None:
        bg_r = jnp.where(mesh_valid, mesh_rgb[0], sky_r)
        bg_g = jnp.where(mesh_valid, mesh_rgb[1], sky_g)
        bg_b = jnp.where(mesh_valid, mesh_rgb[2], sky_b)
        bg_a = mesh_valid.astype(jnp.float32)
    else:
        bg_r, bg_g, bg_b = sky_r, sky_g, sky_b
        bg_a = jnp.zeros((height, width), jnp.float32)

    # --- OIT composite over background -----------------------------------
    cs = config.composite_scale if not has_mesh else 1
    if cs > 1 and width % cs == 0 and height % cs == 0:
        cw, ch = width // cs, height // cs
    else:
        cw, ch = width, height
    if use_warp and use_tile:
        from multivolumes_tpu.render import tilecast

        if mesh is not None and "rows" in mesh.axis_names:
            # 2-D device mesh: the screen composite shards over pixel
            # rows (the sweep already sharded over volumes)
            with jax.named_scope("composite"):
                vr, vg, vb, va = tilecast.composite_oit_tile_sharded(
                    mesh,
                    cube_maps,
                    per_object,
                    cull_for_composite,
                    eye,
                    screen_to_world,
                    depth_map,
                    cw,
                    ch,
                    num_layers=config.oit_layers,
                    order=sweep_order,
                    swap_sorted=sweep_swap,
                )
        else:
            with jax.named_scope("composite"):
                vr, vg, vb, va = tilecast.composite_oit_tile(
                    cube_maps,
                    per_object,
                    cull_for_composite,
                    eye,
                    screen_to_world,
                    depth_map,
                    cw,
                    ch,
                    num_layers=config.oit_layers,
                    order=sweep_order,
                    swap_sorted=sweep_swap,
                )
    elif use_warp:
        from multivolumes_tpu.render import warp as warp_lib

        tile = config.warp_tile
        if tile is None:
            tile = 512 if config.num_volumes <= 8 else 384
        with jax.named_scope("composite"):
            vr, vg, vb, va = warp_lib.composite_oit_warp(
                cube_maps,
                per_object,
                cull_for_composite,
                eye,
                screen_to_world,
                depth_map,
                cw,
                ch,
                num_layers=config.oit_layers,
                tile=tile,
                lod_order=lod_order,
                lod_buckets=lod_buckets,
            )
    else:
        with jax.named_scope("composite"):
            vr, vg, vb, va = composite.composite_oit(
                cube_maps,
                state.volumes,
                state.vol_tex_ids,
                jnp.moveaxis(light_maps, 1, -1) if use_raycast else light_maps,
                per_object,
                cull_for_composite,
                eye,
                screen_to_world,
                depth_map,
                cw,
                ch,
                config.max_ray_samples,
                num_layers=config.oit_layers,
                adaptive=config.adaptive_raymarch,
                use_raycast=use_raycast,
                has_depth=has_mesh,
            )
    if config.debug_finite:
        from jax.experimental import checkify

        checkify.check(
            jnp.all(jnp.isfinite(jnp.stack([vr, vg, vb, va]))),
            "OIT composite produced non-finite screen fields",
        )
    if (cw, ch) != (width, height):
        mu = postprocess._upsample_matrix(width, cw)
        mv = postprocess._upsample_matrix(height, ch)
        vr, vg, vb, va = (mv @ c @ mu.T for c in (vr, vg, vb, va))
    with jax.named_scope("tail"):
        t = 1.0 - va
        sc_r = vr + t * bg_r
        sc_g = vg + t * bg_g
        sc_b = vb + t * bg_b
        sc_a = va + t * bg_a  # mesh pixels opaque (alpha 1), sky alpha 0

    # --- TAA + tone map ---------------------------------------------------
    if use_taa:
        # the windowed history reprojection is only sound under the far
        # raster preset (host pick guarantees the mesh — the one
        # velocity writer — projects inside raster_far_bound <= window);
        # the near preset reprojects FULL-SCREEN, so a close-up mesh can
        # never silently fall back to unreprojected history
        far_preset = bool(config.raster_preset == "far"
                          and config.raster_far_tiers)
        # the pick's hysteresis holds "far" to 1.05x the bound and
        # velocity dilation reaches ~10 px past the silhouette — a
        # window smaller than that ceiling would silently reproject
        # mesh-edge pixels as identity (ghosting); fall back to the
        # always-safe full-screen reprojection instead
        reproj_ok = (config.taa_reproj_window
                     >= -(-21 * int(config.raster_far_bound) // 20) + 16)
        # planar single-device: the resolve kernel also emits the
        # display image (tone map fused in-band — no separate
        # full-screen tonemap/stack kernels in the throughput tail)
        fuse_tm = planar and mesh is None
        with jax.named_scope("tail"):
            taa_out = taa_lib.temporal_aa(
                (sc_r, sc_g, sc_b, sc_a), state.taa_history, velocity,
                reproj_center=(mesh_out.screen_center
                               if has_mesh else None),
                reproj_window=(config.taa_reproj_window
                               if far_preset and reproj_ok else 0),
                device_mesh=mesh, tonemap_out=fuse_tm,
            )
        if fuse_tm:
            (rr, rg, rb), new_history, image = taa_out
        else:
            (rr, rg, rb), new_history = taa_out
            image = None
    else:
        rr, rg, rb = sc_r, sc_g, sc_b
        new_history = state.taa_history
        image = None

    ax = 0 if planar else -1
    with jax.named_scope("tail"):
        if image is None:
            ir, ig, ib = postprocess.tone_map_ch(rr, rg, rb)
            image = jnp.stack([ir, ig, ib], ax)
        hdr = jnp.stack([sc_r, sc_g, sc_b, sc_a], ax)

    new_state = dataclasses.replace(
        state,
        frame_idx=state.frame_idx + 1,
        light_maps=light_maps,
        light_maps_oriented=(state.light_maps_oriented
                             if light_oriented is None else light_oriented),
        light_sout=light_sout,
        taa_history=new_history,
        mesh_prev_wvp=new_prev_wvp,
    )
    return FrameOutput(image=image, hdr=hdr, state=new_state)


def render_frames(
    state: SceneState,
    cameras: Camera,     # pytree with a leading K (frame) axis
    config: RenderConfig,
    show_mesh: Optional[bool] = None,
    use_taa: bool = True,
    mesh: object = None,
    unroll: int = 1,
):
    """Render K frames in ONE dispatch via `lax.scan` — the TPU-native
    analog of the reference's frames-in-flight pipelining (triple
    buffering, `MultiVolumes.h FrameCount=3` + fences
    `MultiVolumes.cpp:709-742`). The carried SceneState (light-map
    cohorts, TAA history, frame index) threads through the scan exactly
    as through repeated `render_frame` calls; the win is host-side — one
    dispatch amortizes the 1-core host's per-call overhead over K frames
    — and, with unroll > 1, XLA may also schedule across frame
    boundaries. Returns ((K, 3, H, W) PLANAR images, final state) — a
    channel-last result buffer lane-pads 42x on TPU (~0.5 GB/frame of
    padded stores); display-layout conversion belongs on the host
    (`np.moveaxis` after readback, see app.py/utils.png).

    Only the fields a frame actually advances ride the scan carry
    (mirrors the `dataclasses.replace` in `render_frame` above); the
    multi-GB invariant fields (volume/light source stacks, mesh tables)
    enter as closed-over scan constants, so no iteration can copy
    them."""
    _CARRIED = ("frame_idx", "light_maps", "light_maps_oriented",
                "light_sout", "taa_history", "mesh_prev_wvp")

    def _pin_row_major(x):
        # Pin the ~1.4 GB oriented light stack ROW-MAJOR through the
        # scan carry. Without this, XLA adopts the transposed layout the
        # stack happens to arrive in (orient_variants_cf's fused
        # transposes) for the whole while-loop carry, then inserts a
        # full relayout copy EVERY iteration to feed the sweep kernel's
        # row-major bitcast — measured 4.06 ms/frame at n=64 (the entire
        # scan-vs-async gap, tools/trace_ops.py --scan). Pinning both
        # the init value and the body output makes the carry row-major:
        # one amortized entry relayout per K-frame call, zero per frame.
        if jax.default_backend() == "cpu" or mesh is not None:
            return x  # CPU tests / sharded path: nothing to pin
        from jax.experimental import layout as layout_lib

        return layout_lib.with_layout_constraint(
            x, layout_lib.Layout(major_to_minor=tuple(range(x.ndim))))

    # Batched per-frame prep: cameras are known upfront, so the small-op
    # prep chain (per-object matrices, cull, LOD order) runs ONCE,
    # vmapped over the K frames, instead of serially inside every scan
    # iteration — the scan body then starts directly at the big passes.
    # (volume_worlds is scan-invariant: it is not in _CARRIED.)
    from multivolumes_tpu.render import sweep as sweep_lib

    def _prep(view_proj, eye):
        po = build_per_object(state.volume_worlds, view_proj)
        cu = cull_lib.cull_volumes(
            po, eye,
            jnp.array([config.width, config.height], jnp.float32),
            config.max_ray_samples, config.cube_map_size,
            config.num_cube_mips, adaptive=config.adaptive_raymarch)
        if config.lod_bucket_caps is not None and config.adaptive_raymarch:
            lod_cull = cu._replace(use_cube_map=cu.visible)
            order = sweep_lib.lod_partition(
                lod_cull, config.num_volumes, config.cube_map_size,
                config.lod_bucket_caps)[0]
        else:
            order = jnp.arange(config.num_volumes, dtype=jnp.int32)
        return po, cu, order

    prep_k = jax.vmap(_prep)(cameras.view_proj, cameras.eye)

    def body(mut, xs):
        cam, prep = xs
        st = dataclasses.replace(state, **dict(zip(_CARRIED, mut)))
        out = render_frame(st, cam, config, show_mesh=show_mesh,
                           use_taa=use_taa, mesh=mesh, planar=True,
                           precomp=prep)
        new = dict((f, getattr(out.state, f)) for f in _CARRIED)
        new["light_maps_oriented"] = _pin_row_major(
            new["light_maps_oriented"])
        return tuple(new[f] for f in _CARRIED), out.image

    mut0 = dict((f, getattr(state, f)) for f in _CARRIED)
    mut0["light_maps_oriented"] = _pin_row_major(
        mut0["light_maps_oriented"])
    mut0 = tuple(mut0[f] for f in _CARRIED)
    mut_end, images = jax.lax.scan(body, mut0, (cameras, prep_k),
                                   unroll=unroll)
    return images, dataclasses.replace(state, **dict(zip(_CARRIED, mut_end)))
