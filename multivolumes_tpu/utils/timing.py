"""Per-pass timing and profiling harness.

The reference's profiling story is PIX captures + an FPS window title
(SURVEY.md section 5). Here: each pipeline stage is jitted and timed
separately with `block_until_ready` (compile excluded via warmup), plus a
`jax.profiler` trace helper for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def sync(tree) -> float:
    """True device sync: fetch one scalar from the last output leaf.

    `block_until_ready` is NOT a reliable sync on tunneled runtimes (axon
    returns once the work is enqueued); only a device->host readback
    proves execution finished. One leaf suffices — all outputs of a jitted
    executable complete together. NOTE: a readback costs ~30 ms of tunnel
    round-trip latency on this host; timing code must amortize it over
    many invocations (`time_fn` does) rather than sync per iteration.
    """
    import numpy as np

    leaves = jax.tree_util.tree_leaves(tree)
    for leaf in reversed(leaves):
        if hasattr(leaf, "ravel") and leaf.size:
            return float(np.asarray(leaf.ravel()[0]))
    return 0.0


def readback_latency(samples: int = 5) -> float:
    """Measured ms of one tiny device->host readback (tunnel round trip)."""
    import jax.numpy as jnp

    x = jnp.zeros((1,), jnp.float32)
    sync(x)
    t0 = time.perf_counter()
    for _ in range(samples):
        sync(x)
    return (time.perf_counter() - t0) / samples * 1000.0


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 8,
            **kwargs) -> float:
    """Mean wall-clock ms of `fn(*args)`: `iters` asynchronously dispatched
    invocations bracketed by one readback sync, with the measured readback
    latency subtracted. Robust to the ~30 ms tunnel round trip."""
    jitted = jax.jit(fn) if not hasattr(fn, "lower") else fn
    out = None
    for _ in range(max(warmup, 1)):
        out = jitted(*args, **kwargs)
    sync(out)
    lat = readback_latency()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args, **kwargs)
    sync(out)
    total = (time.perf_counter() - t0) * 1000.0
    return max(total - lat, 0.0) / iters


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/mv_trace"):
    """`jax.profiler` trace context (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def profile_frame(state, camera, config, iters: int = 3) -> dict:
    """Per-pass timing breakdown of the frame graph. Returns {pass: ms}.

    Stages are timed as separate jits, so totals exceed the fused frame
    time (XLA can overlap/fuse across passes in the real frame function) —
    use for *relative* cost attribution.
    """
    import jax.numpy as jnp

    from multivolumes_tpu.render import (
        composite, cull as cull_lib, lightmarch, mesh as mesh_lib,
        postprocess, raymarch, taa as taa_lib,
    )
    from multivolumes_tpu.render.perframe import build_per_object

    results = {}
    viewport = jnp.array([config.width, config.height], jnp.float32)

    po = build_per_object(state.volume_worlds, camera.view_proj)

    def cull_fn(worlds):
        po_ = build_per_object(worlds, camera.view_proj)
        return cull_lib.cull_volumes(
            po_, camera.eye, viewport, config.max_ray_samples,
            config.cube_map_size, config.num_cube_mips,
        )

    results["cull"] = time_fn(cull_fn, state.volume_worlds, iters=iters)
    cull = jax.jit(cull_fn)(state.volume_worlds)

    shadow_map = jnp.ones((config.shadow_map_size,) * 2, jnp.float32)
    shadow_vp = mesh_lib.shadow_view_proj(state)
    depth_map = jnp.ones((config.height, config.width), jnp.float32)

    if config.light_mode == "sweep":
        from multivolumes_tpu.render import lightsweep

        def light_fn(rho, ao, gd):
            return lightsweep.ray_march_light_sweep(
                rho, ao, gd, state.vol_tex_ids, po, cull,
                shadow_map, shadow_vp, state.light_pos, state.light_color,
                state.ambient, state.sh_coeffs, config.max_light_samples,
                config.has_light_probe,
            )

        results["light_sweep"] = time_fn(
            light_fn, state.rho_light, state.ao_static, state.grad_dir,
            iters=iters,
        )
        light_maps = jax.jit(light_fn)(state.rho_light, state.ao_static,
                                       state.grad_dir)
    else:
        def light_fn(vols, lm):
            return lightmarch.ray_march_light(
                vols, state.vol_tex_ids, lm, po, cull,
                state.frame_idx, shadow_map, shadow_vp, state.light_pos,
                state.light_color, state.ambient, state.sh_coeffs,
                config.max_light_samples, config.has_light_probe,
            )

        results["light_march"] = time_fn(light_fn, state.volumes,
                                         state.light_maps, iters=iters)
        light_maps = jax.jit(light_fn)(state.volumes, state.light_maps)

    if config.march_mode == "sweep":
        from multivolumes_tpu.render import sweep as sweep_lib

        vol_or = sweep_lib.orient_variants(state.volumes)
        lm_or = sweep_lib.orient_variants_cf(light_maps)

        def march_fn(v, l):
            return sweep_lib.ray_march_view_sweep(
                v, state.vol_tex_ids, l, po, cull, camera.eye, depth_map,
                config.cube_map_size, num_planes=config.sweep_planes,
            )

        results["view_march(sweep)"] = time_fn(march_fn, vol_or, lm_or,
                                               iters=iters)
        cube_maps = jax.jit(march_fn)(vol_or, lm_or)
    else:
        def march_fn(v, l):
            # golden path wants channel-last light maps
            return raymarch.ray_march_view(
                v, state.vol_tex_ids, jnp.moveaxis(l, 1, -1), po, cull,
                camera.eye, depth_map,
                config.cube_map_size, config.max_ray_samples,
            )

        results["view_march"] = time_fn(march_fn, state.volumes, light_maps,
                                        iters=iters)
        cube_maps = jax.jit(march_fn)(state.volumes, light_maps)

    def comp_fn(vols, lm, cm_color, cm_depth):
        cm = raymarch.CubeMaps(cm_color, cm_depth)
        return composite.composite_oit(
            cm, vols, state.vol_tex_ids, jnp.moveaxis(lm, 1, -1), po, cull,
            camera.eye, camera.screen_to_world, depth_map,
            config.width, config.height, config.max_ray_samples,
            num_layers=config.oit_layers,
        )

    results["oit_composite"] = time_fn(
        comp_fn, state.volumes, light_maps, cube_maps.color,
        cube_maps.depth, iters=iters,
    )
    vol_rgba = jax.jit(comp_fn)(state.volumes, light_maps,
                                cube_maps.color, cube_maps.depth)

    def sky_fn():
        return postprocess.render_environment(
            state.radiance, camera.screen_to_world, camera.eye,
            config.width, config.height,
        )

    results["sky"] = time_fn(sky_fn, iters=iters)

    def taa_fn(cur_r, history):
        zero = jnp.zeros_like(cur_r)
        return taa_lib.temporal_aa(
            (cur_r, cur_r, cur_r, jnp.minimum(cur_r, 0.9997)),
            history, (zero, zero),
        )

    results["taa"] = time_fn(taa_fn, vol_rgba[0], state.taa_history,
                             iters=iters)
    return results
