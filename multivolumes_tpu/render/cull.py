"""Per-volume visibility culling, face masks, LOD and scheme selection.

Port of the wave-cooperative `CSVolumeCull` kernel
(`Content/Shaders/CSVolumeCull.hlsl:13-78` + `VolumeCull.hlsli`) as a
vmapped pure function. The reference spreads one volume over 8 SIMD lanes
and uses ballots / cross-lane edge tables; the math is plain geometry
(corner projection, sign tests, edge lengths, quad areas), so on TPU it is
a (N, ...) batched computation with reductions — no waves, no append
buffers. The dynamic `AppendStructuredBuffer` visible lists become dense
boolean masks consumed by predicated marching.

Outputs mirror the packed `VolumeInfo` uint4 (`Common.hlsli:20-26`):
mip level, clamped ray-sample count, 6-bit face visibility mask, and the
cube-map-vs-per-pixel scheme bit (`CUBEMAP_RAYMARCH_BIT`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from multivolumes_tpu.core import math3d
from multivolumes_tpu.render.perframe import PerObject

# Cube corner i = (x: i&1, y: (i>>1)&1, z: i>>2) in {-1, +1} — the
# projection order of `ProjectToViewport` (`VolumeCull.hlsli:27-41`).
_CORNERS = np.array(
    [[(i & 1) * 2 - 1, ((i >> 1) & 1) * 2 - 1, (i >> 2) * 2 - 1] for i in range(8)],
    np.float32,
)

# The 12 unique cube edges as corner-index pairs (`VolumeCull.hlsli:119-138`).
_EDGES = np.array(
    [(0, 1), (3, 2), (1, 3), (2, 0), (6, 7), (5, 4),
     (4, 6), (7, 5), (4, 0), (2, 6), (7, 3), (1, 5)],
    np.int32,
)

# Per-face corner loops (single-bit-flip cycles); face order +X,-X,+Y,-Y,+Z,-Z
# matching the face ids of `GetLocalPos` (`CSRayMarch.hlsl:36-49`) and
# `IsFaceVisible` (`VolumeCull.hlsli:46-51`).
_FACE_LOOPS = np.array(
    [[1, 3, 7, 5], [0, 2, 6, 4], [2, 3, 7, 6],
     [0, 1, 5, 4], [4, 5, 7, 6], [0, 1, 3, 2]],
    np.int32,
)


class CullResult(NamedTuple):
    visible: jnp.ndarray        # (N,) bool — passed viewport culling
    mip_level: jnp.ndarray      # (N,) int32
    smp_count: jnp.ndarray      # (N,) int32 clamped ray sample count
    face_mask: jnp.ndarray      # (N, 6) bool per-face visibility
    use_cube_map: jnp.ndarray   # (N,) bool — cube-map vs per-pixel scheme
    max_edge_px: jnp.ndarray    # (N,) float32 (diagnostic / LOD histogram)


def project_corners(world_view_proj, viewport):
    """All 8 corners to viewport space: (N,4,4),(2,) -> (N,8,3) xy px + z."""
    corners = jnp.asarray(_CORNERS)
    h = math3d.transform_point(corners[None, :, :], world_view_proj[:, None, :, :])
    ndc = h[..., :3] / h[..., 3:4]
    xy = ndc[..., :2] * 0.5 + 0.5
    xy = xy.at[..., 1].set(1.0 - xy[..., 1])
    return jnp.concatenate([xy * viewport, ndc[..., 2:3]], axis=-1)


def cull_volumes(per_object: PerObject, eye, viewport,
                 num_samples: int, cube_map_size: int, num_mips: int,
                 adaptive: bool = True,
                 upscale: float = 2.0,
                 ray_sample_count_scale: float = 2.0) -> CullResult:
    """Vmapped CSVolumeCull. viewport: (2,) float (w, h) in pixels."""
    viewport = jnp.asarray(viewport, jnp.float32)
    v = project_corners(per_object.world_view_proj, viewport)  # (N,8,3)

    # Viewport-visibility: any corner inside viewport and 0<z<1
    # (`CSVolumeCull.hlsl:31-38`).
    in_view = (
        jnp.all((v[..., :2] >= 0.0) & (v[..., :2] <= viewport), axis=-1)
        & (v[..., 2] > 0.0)
        & (v[..., 2] < 1.0)
    )
    visible = jnp.any(in_view, axis=-1)

    # Face visibility from the local-space eye (`VolumeCull.hlsli:46-66`):
    # positive face of axis a visible iff eye_local[a] < 1, negative iff > -1.
    eye_local = math3d.transform_point3(jnp.asarray(eye, jnp.float32),
                                        per_object.world_i)  # (N,3)
    pos_vis = eye_local < 1.0
    neg_vis = eye_local > -1.0
    face_mask = jnp.stack(
        [pos_vis[:, 0], neg_vis[:, 0], pos_vis[:, 1],
         neg_vis[:, 1], pos_vis[:, 2], neg_vis[:, 2]], axis=-1
    )

    # Max projected edge length (`EstimateCubeMaxEdgeLength`).
    xy = v[..., :2]
    e = xy[:, _EDGES[:, 1], :] - xy[:, _EDGES[:, 0], :]  # (N,12,2)
    edge_len = jnp.linalg.norm(e, axis=-1)
    max_edge = jnp.max(edge_len, axis=-1)

    # LOD estimate (`EstimateCubeMapLOD`, `VolumeCull.hlsli:267-294`).
    s = max_edge / upscale
    ray_sample_amt = ray_sample_count_scale * s / np.sqrt(3.0)
    smp_count = jnp.minimum(
        jnp.ceil(ray_sample_amt).astype(jnp.int32), num_samples
    )
    ray_sample_amt = jnp.minimum(ray_sample_amt, smp_count.astype(jnp.float32))
    s_clamped = ray_sample_amt / ray_sample_count_scale * np.sqrt(3.0)
    level = jnp.maximum(
        jnp.log2(cube_map_size / jnp.maximum(s_clamped, 1e-6)), 0.0
    ).astype(jnp.int32)
    mip_level = jnp.minimum(level, num_mips - 1)

    # Projected coverage: sum of visible-face quad areas
    # (`EstimateProjCoverage` + `CalcQuadArea`).
    loops = xy[:, _FACE_LOOPS, :]  # (N,6,4,2)
    e0 = loops[:, :, 1] - loops[:, :, 0]
    e1 = loops[:, :, 2] - loops[:, :, 1]
    e2 = loops[:, :, 3] - loops[:, :, 2]
    e3 = loops[:, :, 0] - loops[:, :, 3]
    area = 0.5 * jnp.abs(_det2(e0, e1)) + 0.5 * jnp.abs(_det2(e2, e3))
    proj_cov = jnp.sum(jnp.where(face_mask, area, 0.0), axis=-1)

    # Adaptive scheme decision (`CSVolumeCull.hlsl:64-71`).
    if adaptive:
        edge_px = cube_map_size >> jnp.minimum(mip_level, num_mips - 1)
        cube_map_pix = (edge_px * edge_px).astype(jnp.float32) * jnp.sum(
            face_mask, axis=-1
        ).astype(jnp.float32)
        use_cube_map = cube_map_pix <= proj_cov
    else:
        use_cube_map = jnp.ones_like(visible)

    return CullResult(
        visible=visible,
        mip_level=mip_level,
        smp_count=smp_count,
        face_mask=face_mask & visible[:, None],
        use_cube_map=use_cube_map & visible,
        max_edge_px=max_edge,
    )


def _det2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]
