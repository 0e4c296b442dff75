"""Camera state and the per-frame matrix bundle.

Mirrors the app-side camera handling in `MultiVolumes/MultiVolumes.cpp`:
initial eye (4, 16, -80) looking at the origin (`:273-278`), perspective
`g_FOVAngleY = pi/4` with zNear 1 / zFar 1000 (`:267`), and the orbit
animation `eye = (sin(t/2)*60, 6, cos(t/2)*60)` (`:328-337`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multivolumes_tpu.config import SharedConsts
from multivolumes_tpu.core import math3d


class Camera(NamedTuple):
    eye: jnp.ndarray          # (3,)
    view: jnp.ndarray         # (4, 4) row-vector view matrix
    proj: jnp.ndarray         # (4, 4)

    @property
    def view_proj(self) -> jnp.ndarray:
        return self.view @ self.proj

    @property
    def screen_to_world(self) -> jnp.ndarray:
        """Inverse of viewProj — `g_screenToWorld` in cbPerFrame."""
        return math3d.inverse(self.view_proj)


# jitted: camera construction is per-frame host-side work, and eagerly
# it is ~245 tiny dispatches (~47 ms/frame measured on this 1-core
# host — enough to starve the device); one jit call replaces them
@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def make_camera(eye, focus, aspect: float,
                fov_y: float = SharedConsts.FOV_ANGLE_Y,
                z_near: float = SharedConsts.Z_NEAR,
                z_far: float = SharedConsts.Z_FAR) -> Camera:
    eye = jnp.asarray(eye, jnp.float32)
    focus = jnp.asarray(focus, jnp.float32)
    view = math3d.look_at_lh(eye, focus, jnp.array([0.0, 1.0, 0.0], jnp.float32))
    proj = math3d.perspective_fov_lh(fov_y, aspect, z_near, z_far)
    return Camera(eye=eye, view=view, proj=proj)


def band_camera(camera: Camera, k: int, bands: int) -> Camera:
    """Off-center projection for horizontal row band k of `bands`.

    Rendering the band at height H/bands with this camera reproduces
    rows [k*H/bands, (k+1)*H/bands) of the full-frame render EXACTLY
    (identical pixel centres): post-multiply the projection by a clip-
    space y scale+offset — y' = s*y + (1 - s + 2k)*w with s = bands —
    so band-row j' lands on the same NDC y as full-frame row
    k*H/bands + j'. Per-pixel passes are band-local; an exactness test
    pins full-vs-banded equality (tests/test_fidelity.py).

    Why: the demo-scale reference-twin frame is ONE minutes-long
    dispatch, which reliably crashes the remote TPU worker (the same
    sustained-load failure the fidelity light warmup hit — fixed there
    with z-slab chunking, `lightmarch.py` z_slab); banding keeps each
    dispatch seconds long and syncable."""
    s = float(bands)
    band = jnp.asarray(
        [[1.0, 0.0, 0.0, 0.0],
         [0.0, s, 0.0, 0.0],
         [0.0, 0.0, 1.0, 0.0],
         [0.0, 1.0 - s + 2.0 * k, 0.0, 1.0]], jnp.float32)
    return Camera(eye=camera.eye, view=camera.view,
                  proj=camera.proj @ band)


def default_camera(aspect: float) -> Camera:
    """Start pose from `MultiVolumes.cpp:273-278`."""
    return make_camera(
        jnp.array([4.0, 16.0, -80.0], jnp.float32),
        jnp.array([0.0, 0.0, 0.0], jnp.float32),
        aspect,
    )


@partial(jax.jit, static_argnums=(1,))
def orbit_camera(time_s, aspect: float) -> Camera:
    """Auto-animation pose from `MultiVolumes.cpp:328-337`."""
    t = jnp.asarray(time_s, jnp.float32) * 0.5
    r = 60.0
    eye = jnp.stack([jnp.sin(t) * r, jnp.asarray(6.0, jnp.float32), jnp.cos(t) * r])
    view = math3d.look_at_lh(eye, jnp.zeros((3,), jnp.float32),
                             jnp.array([0.0, 1.0, 0.0], jnp.float32))
    proj = math3d.perspective_fov_lh(SharedConsts.FOV_ANGLE_Y, aspect,
                                     SharedConsts.Z_NEAR, SharedConsts.Z_FAR)
    return Camera(eye=eye, view=view, proj=proj)
