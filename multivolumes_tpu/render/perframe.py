"""Per-frame constant data: the PerObject matrix bundle.

Port of `MultiRayCaster::UpdateFrame` (`Content/MultiRayCaster.cpp:316-353`):
per volume {WorldViewProj, WorldViewProjI, WorldI, World}, all in the
row-vector convention of `multivolumes_tpu.core.math3d`. Instead of mapping
an upload-heap slice per frame-in-flight, these are plain traced arrays
recomputed inside the jitted frame function (a handful of 4x4 inverses —
noise next to the marching work).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multivolumes_tpu.core import math3d


class PerObject(NamedTuple):
    world_view_proj: jnp.ndarray    # (N, 4, 4)
    world_view_proj_i: jnp.ndarray  # (N, 4, 4)
    world_i: jnp.ndarray            # (N, 4, 4)
    world: jnp.ndarray              # (N, 4, 4)


def build_per_object(volume_worlds, view_proj) -> PerObject:
    """(N,4,4), (4,4) -> PerObject."""

    def per_volume(world):
        wvp = world @ view_proj
        return wvp, math3d.inverse(wvp), math3d.inverse(world), world

    wvp, wvp_i, w_i, w = jax.vmap(per_volume)(volume_worlds)
    return PerObject(wvp, wvp_i, w_i, w)
