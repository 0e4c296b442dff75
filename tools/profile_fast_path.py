"""Per-pass profile of the production fast path (sweep + warp composite).

`utils.timing.profile_frame` profiles the golden/gather path; this script
times the passes the bench config actually runs (LOD sweep, warp
composite, light sweep, orient, sky, TAA) plus the fused frame, on
whatever platform is active. Run from the repo root:

    python tools/profile_fast_path.py [--volumes 64] [--small]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# repo-root import without PYTHONPATH (the env var breaks axon plugin
# discovery on this host)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--volumes", type=int, default=64)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--warp-composite", action="store_true",
                    help="also time the XLA warp twin")
    ap.add_argument("--only", default=None,
                    help="comma-separated substrings: time only passes "
                         "whose name matches (knob A/B without paying "
                         "every pass's compile; upstream passes a "
                         "selected pass depends on still run once, "
                         "untimed)")
    args = ap.parse_args()

    from multivolumes_tpu.utils.platform import configure_for_host

    configure_for_host()

    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.core import camera as cam_lib
    from multivolumes_tpu.render import frame as frame_lib
    from multivolumes_tpu.render import cull as cull_lib, lightsweep
    from multivolumes_tpu.render import sweep as sweep_lib, warp as warp_lib
    from multivolumes_tpu.render import postprocess, taa as taa_lib
    from multivolumes_tpu.render import mesh as mesh_lib, tilecast
    from multivolumes_tpu.render.perframe import build_per_object
    from multivolumes_tpu.scene import state as state_lib
    from multivolumes_tpu.utils.timing import sync

    if args.small:
        cfg = RenderConfig(
            width=320, height=200, grid_size=32, light_grid_size=16,
            max_ray_samples=64, max_light_samples=16,
            num_volumes=args.volumes, num_volume_srcs=2,
            cube_map_size=32, shadow_map_size=64,
        )
    else:
        cfg = RenderConfig(
            width=1280, height=800, grid_size=128, light_grid_size=96,
            max_ray_samples=256, max_light_samples=96,
            num_volumes=args.volumes, num_volume_srcs=10,
            cube_map_size=128, shadow_map_size=1024,
        )
    state = None
    if args.mesh:
        from multivolumes_tpu.engine import MultiRayCaster

        eng = MultiRayCaster(cfg)
        eng.set_mesh("/root/reference/Bin/Assets/bunny.obj")
        cfg = eng.config
        state = eng.state
    if state is None:
        state = state_lib.create_scene(cfg)
    camera = cam_lib.orbit_camera(0.0, cfg.aspect_ratio)
    dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32

    from multivolumes_tpu.utils.timing import readback_latency

    lat = [None]

    only = ([s for s in args.only.split(",") if s]
            if args.only else None)  # drop typo empties ('' matches all)
    # passes whose outputs later passes consume: run them (untimed)
    # even when filtered out; anything else is skipped outright so a
    # knob A/B pays only the selected pass's compile + its producers'
    # (the light/orient outputs feed nothing timed — the sweep reads
    # the state-carried stacks — so they are NOT producers).
    # mesh IS a producer: its depth map feeds the sweep's occlusion
    # skip and the composite's CubeCast depth weights (the production
    # kernel variant — depth=None would measure the plain-tent kernel).
    _PRODUCERS = ("sweep_lod", "mesh")

    def timed(name, fn, *a):
        # dispatch `iters` calls asynchronously, sync once, subtract the
        # measured ~30 ms tunnel readback latency (see utils/timing.py)
        if only is not None and not any(sub in name for sub in only):
            if any(name.startswith(p) for p in _PRODUCERS):
                return jax.jit(fn)(*a)
            return None
        j = jax.jit(fn)
        print(f"{name:28s} ...", end="", flush=True)
        out = j(*a)
        sync(out)
        if lat[0] is None:
            lat[0] = readback_latency()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = j(*a)
        sync(r)
        total = (time.perf_counter() - t0) * 1000 - lat[0]
        del r
        print(f"\r{name:28s} {max(total, 0.0) / args.iters:9.1f} ms")
        return out

    po = build_per_object(state.volume_worlds, camera.view_proj)
    viewport = jnp.array([cfg.width, cfg.height], jnp.float32)
    cull = cull_lib.cull_volumes(
        po, camera.eye, viewport, cfg.max_ray_samples, cfg.cube_map_size,
        cfg.num_cube_mips, adaptive=cfg.adaptive_raymarch)
    shadow_vp = mesh_lib.shadow_view_proj(state)

    # mesh FIRST: its depth map is the production input to the sweep's
    # occlusion skip and the composite's CubeCast depth weights
    mesh_out = None
    if args.mesh:
        mesh_out = timed("mesh(shadow+depth+base)", lambda:
                         mesh_lib.render_mesh(state, camera, cfg))
    depth_map = mesh_out.depth if mesh_out is not None else None

    # amortized light update (the production per-frame cohort) + orient
    shadow_for_sweep = state.mesh_shadow_map if args.mesh else None
    c = min(cfg.light_refresh or cfg.num_volumes, cfg.num_volumes)
    ids = jnp.arange(c, dtype=jnp.int32)
    lm_c = timed(
        f"light_update({c}/{cfg.num_volumes})",
        lambda rho, ao, gd: lightsweep.ray_march_light_sweep_update(
            rho, ao, gd, state.vol_tex_ids, po, shadow_for_sweep, shadow_vp,
            state.light_pos, state.light_color, state.ambient,
            state.sh_coeffs, cfg.max_light_samples,
            has_light_probe=cfg.has_light_probe,
            sub_ids=ids, sout_cache=state.light_sout,
            shadow_quads=(state.mesh_shadow_quads
                          if shadow_for_sweep is not None else None))[0],
        state.rho_light, state.ao_static, state.grad_dir)

    vol_or = state.volumes_oriented.astype(dtype)
    if lm_c is not None:  # skipped under --only
        lm_or_c = timed("orient_cohort", sweep_lib.orient_variants_cf,
                        lm_c.astype(dtype))
        del lm_or_c
    del lm_c
    lm_or = state.light_maps_oriented.astype(dtype)

    # LOD sweep
    lod_cull = cull._replace(use_cube_map=cull.visible)

    swap_basis = warp_lib.screen_basis(camera.screen_to_world, camera.eye)

    def sweep_fn(v, l):
        # sorted_output + order + depth + zmax + swap_basis matches the
        # production tile path (frame.py use_tile) — the unsorted
        # scatter assembly would charge this row ~1.3 ms the frame no
        # longer pays; swap_basis folds the composite's face-swap +
        # depth-unproject into the assembly writes
        return sweep_lib.ray_march_view_sweep_lod(
            v, state.vol_tex_ids, l, po, lod_cull, camera.eye, depth_map,
            cfg.cube_map_size, dtype=dtype, bucket_caps=cfg.lod_bucket_caps,
            pack=False, light_w=cfg.light_grid_size,
            vol_zmax=state.vol_zmax, sorted_output=True,
            swap_basis=swap_basis)

    cube_maps, sweep_mips, sweep_order, sweep_swap = timed(
        "sweep_lod", sweep_fn, vol_or, lm_or)
    del vol_or, lm_or  # free the oriented transients before compositing

    # warp composite (mip-aligned footprint classes)
    cull_c = cull._replace(
        mip_level=sweep_mips, use_cube_map=cull.visible)
    lod_order, lod_buckets = sweep_lib.lod_partition(
        lod_cull, cfg.num_volumes, cfg.cube_map_size, cfg.lod_bucket_caps)
    tile = cfg.warp_tile or (512 if cfg.num_volumes <= 8 else 384)
    cs = cfg.composite_scale
    cw, ch = (cfg.width // cs, cfg.height // cs) if cs > 1 else (cfg.width, cfg.height)

    timed("tile_composite", lambda cm_color: tilecast.composite_oit_tile(
        cube_maps._replace(color=cm_color), po, cull_c, camera.eye,
        camera.screen_to_world, depth_map, cw, ch,
        num_layers=cfg.oit_layers, order=sweep_order,
        swap_sorted=sweep_swap)[0], cube_maps.color)
    if args.warp_composite:
        # the warp twin consumes original volume indexing and UNSWAPPED
        # faces: undo the tile-path swap (transpose is an involution),
        # then un-permute the sorted rows (argsort inverts)
        inv = jnp.argsort(sweep_order)
        plain = jnp.where(
            sweep_swap[:, :, None, None, None],
            jnp.swapaxes(cube_maps.color, -1, -2), cube_maps.color)
        timed("warp_composite", lambda cm_color: warp_lib.composite_oit_warp(
            cube_maps._replace(color=cm_color), po, cull_c, camera.eye,
            camera.screen_to_world, None, cw, ch,
            num_layers=cfg.oit_layers, tile=tile,
            lod_order=lod_order, lod_buckets=lod_buckets),
            plain[inv])

    # sky
    timed("sky", lambda: postprocess.render_environment(
        state.radiance, camera.screen_to_world, camera.eye, cfg.width,
        cfg.height, scale=cfg.sky_scale))

    # TAA (no-velocity path when no mesh; the windowed mesh reprojection
    # matching frame.py — passing no center would time the much larger
    # full-screen reprojection the frame never runs)
    zero = jnp.zeros((cfg.height, cfg.width), jnp.float32)
    vel = (zero, zero) if args.mesh else None
    center = ((cfg.width * 0.5, cfg.height * 0.5) if args.mesh else None)
    timed("taa", lambda r, h: taa_lib.temporal_aa(
        (r, r, r, jnp.minimum(r, 0.9997)), h, vel,
        reproj_center=center, reproj_window=cfg.taa_reproj_window),
        zero, state.taa_history)

    if args.mesh:
        timed("mesh(shadow+depth+base)", lambda: mesh_lib.render_mesh(
            state, camera, cfg))

    # fused frame
    def step(state, camera):
        out = frame_lib.render_frame(state, camera, cfg, use_taa=True)
        return out.image, out.state

    timed("FULL FRAME", step, state, camera)

    # multi-frame scan dispatch (bench.py's amortized headline mode):
    # per-frame time = the printed number / 8
    k = 8
    cams = [cam_lib.orbit_camera((i + 1) / 60.0, cfg.aspect_ratio)
            for i in range(k)]
    cams_st = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *cams)
    timed(f"FULL FRAME (scan x{k})",
          lambda s, c: frame_lib.render_frames(s, c, cfg, use_taa=True),
          state, cams_st)


if __name__ == "__main__":
    main()
