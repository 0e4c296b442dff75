"""Multi-chip scaling: shard the volume axis and the pixel rows over an ICI
device mesh.

The reference is single-GPU; its scaling axes are threadgroups and
instancing (SURVEY.md section 2.6). The TPU engine scales across chips with
`jax.sharding` + jit (GSPMD):

- mesh: 1-D ("volumes",) — the per-volume axis is the natural
  model/expert-parallel axis: cube-map marching and light maps are
  independent per volume (the inter-volume light coupling reads only the
  *source textures*, which are replicated).
- per-volume state (worlds, light maps, tex ids) is sharded on that axis;
  the marched cube maps stay sharded; the OIT composite needs every
  volume's (small, <=0.8 MB) cube map at every pixel, so XLA inserts an
  all-gather over ICI there — exactly the plan in SURVEY.md section 2.6.
- screen-space passes (composite, TAA, tone map, sky) are data-parallel
  over pixel rows; with a 2-D ("rows", "volumes") mesh both axes shard.

Everything is expressed as input shardings on one jitted frame step; XLA
places the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multivolumes_tpu.config import RenderConfig
from multivolumes_tpu.core import camera as cam_lib
from multivolumes_tpu.render import frame as frame_lib
from multivolumes_tpu.scene import state as state_lib
from multivolumes_tpu.scene.state import SceneState


def make_mesh(n_devices: int, rows: int = 1) -> Mesh:
    """1-D volume mesh, or 2-D (rows x volumes) when rows > 1."""
    devices = np.asarray(jax.devices()[: n_devices * rows])
    if rows > 1:
        return Mesh(devices.reshape(rows, n_devices), ("rows", "volumes"))
    return Mesh(devices, ("volumes",))


def state_shardings(mesh: Mesh, state: SceneState,
                    shard_light: bool = False) -> SceneState:
    """Per-field NamedShardings: volume axis sharded, rest replicated (or
    row-sharded for screen-size buffers on a 2-D mesh)."""
    has_rows = "rows" in mesh.axis_names
    rep = NamedSharding(mesh, P())
    vol = NamedSharding(mesh, P("volumes"))
    rows = NamedSharding(mesh, P("rows")) if has_rows else rep
    # The light stacks are the dominant carried state (~1.4 GB oriented
    # at demo scale). Replicated by default: the sharded view sweep
    # slices its local volumes out with zero per-frame collectives, and
    # the amortized cohort refresh updates them replicated. shard_light
    # (config.shard_light_stacks) shards them over the volume axis for
    # multi-chip MEMORY scaling — per-device bytes fall to 1/D, the
    # sweep reads its LOCAL shard, and the cohort refresh lowers to a
    # shard-local masked write (placement_check pins that no collective
    # ever carries a stack).
    light = vol if shard_light else rep

    return SceneState(
        frame_idx=rep,
        volumes=rep,               # source textures replicated (shared reads)
        volumes_oriented=rep,
        vol_zmax=rep,
        vol_tex_ids=vol,
        volume_worlds=vol,
        light_maps=light,
        light_maps_oriented=light,
        light_sout=light,
        sh_coeffs=rep,
        radiance=rep,
        light_pos=rep,
        light_color=rep,
        ambient=rep,
        taa_history=rows,
        mesh_verts=rep,
        mesh_indices=rep,
        mesh_world=rep,
        mesh_prev_wvp=rep,
        mesh_shadow_map=rep,
        mesh_shadow_quads=rep,
        scene_size=rep,
        rho_light=rep,
        ao_static=rep,
        grad_dir=rep,
    )


def make_sharded_step(cfg: RenderConfig, mesh: Mesh):
    """jit the frame step with sharded inputs/outputs."""

    def step(state, camera):
        out = frame_lib.render_frame(state, camera, cfg, use_taa=True,
                                     mesh=mesh)
        return out.image, out.state

    dummy = state_lib.create_scene(cfg)
    s_shard = state_shardings(mesh, dummy,
                              shard_light=cfg.shard_light_stacks)
    cam_shard = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()),
        cam_lib.default_camera(cfg.aspect_ratio),
    )
    has_rows = "rows" in mesh.axis_names
    img_shard = NamedSharding(mesh, P("rows")) if has_rows else NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(s_shard, cam_shard),
        out_shardings=(img_shard, s_shard),
    )


def shard_state(state: SceneState, mesh: Mesh,
                shard_light: bool = False) -> SceneState:
    shardings = state_shardings(mesh, state, shard_light=shard_light)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, shardings
    )


def placement_check(n_devices: int, shard_light: bool = False) -> dict:
    """Compile the sharded step and verify the collective pattern of the
    SURVEY section-2.6 plan from the post-SPMD HLO:

    * the view sweep is partitioned over volumes BY CONSTRUCTION
      (`sweep.ray_march_view_sweep_lod_sharded` is a shard_map manual
      region — GSPMD cannot replicate it), and its sharded cube-map
      output must therefore be all-gathered into the replicated screen
      composite: assert that all-gather exists;
    * nothing bigger moves per frame: assert no collective carries more
      elements than that cube-map gather (catches regressions like the
      oriented light/volume stacks being gathered or scatter-reduced,
      which would void multi-chip scaling).

    Returns a summary dict (also used by the placement test).
    """
    import re

    cfg = RenderConfig(
        width=96, height=64, grid_size=16, light_grid_size=16,
        max_ray_samples=16, max_light_samples=8,
        num_volumes=max(n_devices, 2), num_volume_srcs=2,
        cube_map_size=8, shadow_map_size=32,
        shard_light_stacks=shard_light,
    )
    mesh = make_mesh(n_devices)
    state = state_lib.create_scene(cfg)
    camera = cam_lib.default_camera(cfg.aspect_ratio)
    step = make_sharded_step(cfg, mesh)
    txt = step.lower(shard_state(state, mesh, shard_light=shard_light),
                     camera).compile().as_text()

    def elems(shape: str) -> int:
        m = re.search(r"\[([\d,]*)\]", shape)
        if not m or not m.group(1):
            return 1
        out = 1
        for x in m.group(1).split(","):
            out *= int(x)
        return out

    colls = []
    for line in txt.splitlines():
        if "=" not in line:
            continue
        for op in ("all-gather(", "all-gather-start(", "all-reduce(",
                   "all-reduce-start(", "collective-permute(",
                   "all-to-all(", "reduce-scatter("):
            if f" {op}" in line.split("=", 1)[1]:
                shape = line.split("=")[1].strip().split(" ")[0]
                colls.append((op.rstrip("("), shape, elems(shape)))

    n = cfg.num_volumes
    s = cfg.cube_map_size
    # cube color all-gather: (N, 6, 4, S, S_lane-padded)
    cube_elems = n * 6 * 4 * s * (-(-s // 128) * 128)
    gathers = [c for c in colls if c[0].startswith("all-gather")]
    cube_gathers = [c for c in gathers if c[2] == cube_elems]
    assert cube_gathers, (
        "expected the sharded sweep's cube-map all-gather "
        f"({cube_elems} elems); collectives: {colls}")
    too_big = [c for c in colls if c[2] > cube_elems]
    assert not too_big, (
        "collectives larger than the cube-map all-gather (the sweep "
        f"inputs or light stacks are moving per frame): {too_big}")
    return {
        "collectives": colls,
        "cube_gather_elems": cube_elems,
        "largest_elems": max(c[2] for c in colls) if colls else 0,
    }


def dryrun(n_devices: int) -> None:
    """Compile + execute one sharded frame step on tiny shapes.

    The driver calls this under `xla_force_host_platform_device_count=N`.
    """
    if len(jax.devices()) < n_devices:
        # The axon TPU plugin overrides JAX_PLATFORMS; fall back to forcing
        # the CPU backend at the config level (works when backends are not
        # yet initialized in this process).
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(jax.devices())} "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count and do "
            "not initialize a non-CPU backend first)"
        )
    cfg = RenderConfig(
        width=96, height=64, grid_size=16, light_grid_size=8,
        max_ray_samples=16, max_light_samples=8,
        num_volumes=max(n_devices, 2), num_volume_srcs=2,
        cube_map_size=16, shadow_map_size=32,
    )
    # with >= 4 devices validate the FULL 2-D (rows x volumes) story:
    # volume-sharded sweep + row-sharded composite/TAA in one step
    if n_devices >= 4 and n_devices % 2 == 0:
        mesh = make_mesh(n_devices // 2, rows=2)
    else:
        mesh = make_mesh(n_devices)
    state = state_lib.create_scene(cfg)
    camera = cam_lib.default_camera(cfg.aspect_ratio)

    step = make_sharded_step(cfg, mesh)
    state = shard_state(state, mesh)
    img, new_state = step(state, camera)
    img.block_until_ready()
    assert img.shape == (cfg.height, cfg.width, 3)
    assert int(new_state.frame_idx) == 1
