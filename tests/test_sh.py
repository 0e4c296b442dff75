"""SH projection + irradiance vs direct numerical integration."""

import numpy as np
import jax.numpy as jnp

from multivolumes_tpu.core import sh


def test_solid_angles_sum_to_4pi():
    w = sh.cube_texel_solid_angles(32)
    np.testing.assert_allclose(6 * w.sum(), 4 * np.pi, rtol=1e-3)


def test_cube_dirs_unit_and_cover_axes():
    d = sh.cube_face_dirs(16)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)
    # face 0 (+X) has all x > 0, etc.
    assert (d[0][..., 0] > 0).all() and (d[1][..., 0] < 0).all()
    assert (d[2][..., 1] > 0).all() and (d[3][..., 1] < 0).all()
    assert (d[4][..., 2] > 0).all() and (d[5][..., 2] < 0).all()


def test_constant_radiance_projects_to_l00_only():
    size = 32
    radiance = np.ones((6, size, size, 3), np.float32) * 2.0
    coeffs = np.asarray(sh.project_cube_map(jnp.asarray(radiance)))
    # L00 = 2 * integral Y00 dOmega = 2 * sqrt(4pi)
    np.testing.assert_allclose(coeffs[0], 2.0 * np.sqrt(4 * np.pi), rtol=1e-3)
    np.testing.assert_allclose(coeffs[1:], 0.0, atol=1e-3)


def test_irradiance_of_constant_env_is_pi_times_radiance():
    # E(n) for constant radiance L is pi * L... divided by pi for exit
    # radiance; the SH formula yields E = L * pi / pi? Direct check against
    # numeric integration of max(cos) * L over the sphere / steradian:
    size = 64
    lval = 1.5
    radiance = np.ones((6, size, size, 3), np.float32) * lval
    coeffs = sh.project_cube_map(jnp.asarray(radiance))
    n = jnp.asarray(np.array([[0.0, 1.0, 0.0]], np.float32))
    e = np.asarray(sh.eval_irradiance(coeffs, n))[0]
    np.testing.assert_allclose(e, np.pi * lval, rtol=2e-2)


def test_irradiance_matches_numeric_integration():
    rng = np.random.RandomState(3)
    size = 64
    dirs = sh.cube_face_dirs(size)
    w = sh.cube_texel_solid_angles(size)
    # smooth low-frequency radiance field
    radiance = (
        0.5
        + 0.4 * dirs[..., 1:2]
        + 0.3 * dirs[..., 0:1] * dirs[..., 2:3]
        + 0.2 * dirs[..., 0:1] ** 2
    ).astype(np.float32)
    radiance = np.repeat(radiance, 3, axis=-1)
    coeffs = sh.project_cube_map(jnp.asarray(radiance))

    for _ in range(5):
        n = rng.randn(3)
        n /= np.linalg.norm(n)
        cos = np.clip(np.einsum("fuvc,c->fuv", dirs, n.astype(np.float32)), 0, None)
        want = (radiance[..., 0] * cos * w[None]).sum()
        got = np.asarray(
            sh.eval_irradiance(coeffs, jnp.asarray(n[None].astype(np.float32)))
        )[0, 0]
        # SH order-3 is exact for radiance up to quadratic x cosine lobe ~97%
        np.testing.assert_allclose(got, want, rtol=6e-2, atol=2e-2)
