"""core.math3d vs brute-force numpy (DirectXMath conventions)."""

import numpy as np
import jax.numpy as jnp

from multivolumes_tpu.core import math3d


def test_look_at_lh_maps_eye_to_origin():
    eye = jnp.array([4.0, 16.0, -80.0])
    m = math3d.look_at_lh(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    p = math3d.transform_point(eye, m)
    np.testing.assert_allclose(np.asarray(p[:3]), 0.0, atol=1e-4)
    # focus lands on +z axis at distance |eye|
    f = math3d.transform_point(jnp.zeros(3), m)
    np.testing.assert_allclose(np.asarray(f[:2]), 0.0, atol=1e-4)
    assert float(f[2]) > 0


def test_perspective_depth_range():
    m = math3d.perspective_fov_lh(np.pi / 4, 1.6, 1.0, 1000.0)
    near = math3d.project_point(jnp.array([0.0, 0.0, 1.0]), m)
    far = math3d.project_point(jnp.array([0.0, 0.0, 1000.0]), m)
    np.testing.assert_allclose(float(near[2]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(far[2]), 1.0, atol=1e-5)


def test_perspective_fov():
    fov = np.pi / 4
    m = math3d.perspective_fov_lh(fov, 1.0, 1.0, 1000.0)
    # A point at the top edge of the frustum projects to y = 1
    z = 10.0
    y = np.tan(fov / 2) * z
    p = math3d.project_point(jnp.array([0.0, y, z]), m)
    np.testing.assert_allclose(float(p[1]), 1.0, rtol=1e-5)


def test_orthographic():
    m = math3d.orthographic_lh(30.0, 30.0, 1.0, 200.0)
    p = math3d.project_point(jnp.array([15.0, -15.0, 200.0]), m)
    np.testing.assert_allclose(np.asarray(p), [1.0, -1.0, 1.0], rtol=1e-5)


def test_inverse_roundtrip():
    rng = np.random.RandomState(0)
    world = math3d.scaling(5.0) @ math3d.translation(jnp.array([1.0, 2.0, 3.0]))
    view = math3d.look_at_lh(
        jnp.asarray(rng.randn(3).astype(np.float32) * 10),
        jnp.zeros(3),
        jnp.array([0.0, 1.0, 0.0]),
    )
    proj = math3d.perspective_fov_lh(np.pi / 4, 1.6, 1.0, 1000.0)
    m = world @ view @ proj
    mi = math3d.inverse(m)
    p = jnp.array([0.3, -0.2, 0.7])
    h = math3d.transform_point(p, m)
    back = math3d.transform_point(jnp.asarray(h[:3] / h[3]), mi)
    np.testing.assert_allclose(np.asarray(back[:3] / back[3]), np.asarray(p), atol=1e-3)


def test_transform_vector_ignores_translation():
    m = math3d.translation(jnp.array([5.0, 6.0, 7.0]))
    v = math3d.transform_vector(jnp.array([1.0, 0.0, 0.0]), m)
    np.testing.assert_allclose(np.asarray(v), [1.0, 0.0, 0.0])
