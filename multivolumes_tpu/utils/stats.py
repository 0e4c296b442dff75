"""Per-frame render statistics — the observability the reference lacks.

The reference computes visibility lists and LOD decisions on-GPU and never
reads them back (SURVEY.md section 5: its only metric is the FPS window
title, `MultiVolumes.cpp:766-812`). Here the cull result is a pytree, so
per-frame stats are one jitted reduction away.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from multivolumes_tpu.render.cull import CullResult


class FrameStats(NamedTuple):
    num_volumes: jnp.ndarray        # ()
    visible: jnp.ndarray            # () volumes passing viewport culling
    cube_path: jnp.ndarray          # () volumes on the cube-map scheme
    pixel_path: jnp.ndarray         # () volumes on the per-pixel scheme
    visible_faces: jnp.ndarray      # () total marched faces
    mip_histogram: jnp.ndarray      # (8,) volumes per mip level
    mean_samples: jnp.ndarray       # () mean clamped ray sample count
    max_edge_px: jnp.ndarray        # () largest projected cube edge


def frame_stats(cull: CullResult) -> FrameStats:
    n = cull.visible.shape[0]
    vis = cull.visible
    visible = jnp.sum(vis.astype(jnp.int32))
    cube = jnp.sum((vis & cull.use_cube_map).astype(jnp.int32))
    mips = jnp.zeros((8,), jnp.int32)
    mips = mips.at[jnp.clip(cull.mip_level, 0, 7)].add(vis.astype(jnp.int32))
    return FrameStats(
        num_volumes=jnp.asarray(n, jnp.int32),
        visible=visible,
        cube_path=cube,
        pixel_path=visible - cube,
        visible_faces=jnp.sum(cull.face_mask.astype(jnp.int32)),
        mip_histogram=mips,
        mean_samples=jnp.mean(
            jnp.where(vis, cull.smp_count, 0).astype(jnp.float32)
        ),
        max_edge_px=jnp.max(jnp.where(vis, cull.max_edge_px, 0.0)),
    )


def format_stats(stats: FrameStats) -> str:
    import numpy as np

    mips = np.asarray(stats.mip_histogram)
    return (
        f"volumes {int(stats.visible)}/{int(stats.num_volumes)} visible, "
        f"{int(stats.cube_path)} cube-map / {int(stats.pixel_path)} per-pixel, "
        f"{int(stats.visible_faces)} faces, "
        f"mips {mips[:5].tolist()}, "
        f"mean samples {float(stats.mean_samples):.1f}, "
        f"max edge {float(stats.max_edge_px):.0f} px"
    )
