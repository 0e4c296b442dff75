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
state)`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

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
) -> FrameOutput:
    width, height = config.width, config.height
    show_mesh = config.show_mesh if show_mesh is None else show_mesh

    view_proj = camera.view_proj
    screen_to_world = camera.screen_to_world
    eye = camera.eye

    per_object = build_per_object(state.volume_worlds, view_proj)

    # --- opaque mesh: shadow + depth + base pass -------------------------
    if show_mesh and state.mesh_indices.shape[0] > 1:
        mesh_out = mesh_lib.render_mesh(state, camera, config)
        depth_map = mesh_out.depth
        shadow_map = mesh_out.shadow
        shadow_vp = mesh_out.shadow_vp
        mesh_color = mesh_out.color
        velocity = mesh_out.velocity
        new_prev_wvp = mesh_out.new_prev_wvp
    else:
        depth_map = jnp.ones((height, width), jnp.float32)
        shadow_map = jnp.ones(
            (config.shadow_map_size, config.shadow_map_size), jnp.float32
        )
        shadow_vp = mesh_lib.shadow_view_proj(state)
        mesh_color = None
        velocity = jnp.zeros((height, width, 2), jnp.float32)
        new_prev_wvp = state.mesh_prev_wvp

    # --- volume culling / LOD -------------------------------------------
    cull = cull_lib.cull_volumes(
        per_object,
        eye,
        jnp.array([width, height], jnp.float32),
        config.max_ray_samples,
        config.cube_map_size,
        config.num_cube_mips,
        adaptive=config.adaptive_raymarch,
    )

    # --- light-space march: refresh one volume's light map per frame ----
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
    )

    # --- view-space cube-map march ---------------------------------------
    cube_maps = raymarch.ray_march_view(
        state.volumes,
        state.vol_tex_ids,
        light_maps,
        per_object,
        cull,
        eye,
        depth_map,
        config.cube_map_size,
        config.max_ray_samples,
        adaptive=config.adaptive_raymarch,
    )

    # --- background: sky behind mesh -------------------------------------
    sky = postprocess.render_environment(
        state.radiance, screen_to_world, eye, width, height
    )
    if mesh_color is not None:
        background = jnp.where(
            (depth_map < 1.0)[..., None], mesh_color[..., :3], sky
        )
    else:
        background = sky

    # --- OIT composite over background -----------------------------------
    vol_color = composite.composite_oit(
        cube_maps,
        state.volumes,
        state.vol_tex_ids,
        light_maps,
        per_object,
        cull,
        eye,
        screen_to_world,
        depth_map,
        width,
        height,
        config.max_ray_samples,
        num_layers=config.oit_layers,
        adaptive=config.adaptive_raymarch,
    )
    scene_rgb = vol_color[..., :3] + (1.0 - vol_color[..., 3:4]) * background
    scene = jnp.concatenate([scene_rgb, vol_color[..., 3:4]], -1)

    # --- TAA + tone map ---------------------------------------------------
    if use_taa:
        taa_out, new_history = taa_lib.temporal_aa(
            scene, state.taa_history, velocity
        )
    else:
        taa_out, new_history = scene, state.taa_history

    image = postprocess.tone_map(taa_out)

    import dataclasses

    new_state = dataclasses.replace(
        state,
        frame_idx=state.frame_idx + 1,
        light_maps=light_maps,
        taa_history=new_history,
        mesh_prev_wvp=new_prev_wvp,
    )
    return FrameOutput(image=image, hdr=scene, state=new_state)
