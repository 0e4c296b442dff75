"""Culling/LOD vs hand-computed geometry."""

import numpy as np
import jax
import jax.numpy as jnp

from multivolumes_tpu.core import camera as cam_lib, math3d
from multivolumes_tpu.render import cull as cull_lib
from multivolumes_tpu.render.perframe import build_per_object


def _setup(worlds, eye=(0.0, 0.0, -30.0), viewport=(640.0, 400.0)):
    cam = cam_lib.make_camera(
        jnp.asarray(eye, jnp.float32), jnp.zeros(3), viewport[0] / viewport[1]
    )
    po = build_per_object(jnp.asarray(worlds), cam.view_proj)
    res = jax.jit(
        lambda po_, eye_: cull_lib.cull_volumes(
            po_, eye_, jnp.asarray(viewport, jnp.float32), 256, 128, 5
        )
    )(po, cam.eye)
    return res


def _world(scale, pos):
    w = np.eye(4, dtype=np.float32)
    w[0, 0] = w[1, 1] = w[2, 2] = scale
    w[3, :3] = pos
    return w


def test_visibility_in_and_out_of_view():
    worlds = np.stack([
        _world(5.0, (0, 0, 0)),        # centered, visible
        _world(5.0, (0, 0, -60.0)),    # behind the camera
        _world(5.0, (1000.0, 0, 0)),   # far off-screen
    ])
    res = _setup(worlds)
    assert bool(res.visible[0])
    assert not bool(res.visible[1])
    assert not bool(res.visible[2])


def test_face_mask_from_eye_position():
    # Eye on -z side of a cube at origin: -Z face (index 5) visible from
    # outside means eye_local.z > -1 -> False... interior-face rule:
    # +Z interior face (idx 4) visible iff eye.z < 1 (true); -Z interior
    # (idx 5) visible iff eye.z > -1 (false, eye at z=-30 local -6).
    worlds = np.stack([_world(5.0, (0, 0, 0))])
    res = _setup(worlds)
    mask = np.asarray(res.face_mask[0])
    assert mask[4] and not mask[5]          # +Z seen, -Z culled
    assert mask[0] and mask[1]              # +-X interior both visible
    assert mask[2] and mask[3]              # +-Y interior both visible


def test_lod_monotonic_with_distance():
    worlds = np.stack([
        _world(5.0, (0, 0, 0)),
        _world(5.0, (0, 0, 150.0)),
    ])
    res = _setup(worlds)
    assert int(res.mip_level[1]) >= int(res.mip_level[0])
    assert int(res.smp_count[1]) <= int(res.smp_count[0])


def test_small_volume_prefers_per_pixel():
    # A tiny projected volume covers fewer pixels than its cube map ->
    # per-pixel scheme (`CSVolumeCull.hlsl:64-71`).
    worlds = np.stack([
        _world(8.0, (0, 0, 0)),       # big on screen
        _world(0.3, (3.0, 0, 0)),     # tiny
    ])
    res = _setup(worlds)
    assert bool(res.visible[1])
    assert not bool(res.use_cube_map[1]) or int(res.mip_level[1]) == 4
