"""Pallas TAA kernel vs the jnp semantics twin (render/taa.py)."""

import jax.numpy as jnp
import numpy as np

from multivolumes_tpu.render import taa


def _mk_inputs(h, w, seed=0, with_velocity=False):
    rng = np.random.RandomState(seed)
    cur = tuple(
        jnp.asarray(rng.rand(h, w).astype(np.float32) * 2.0)
        for _ in range(3)
    ) + (jnp.asarray(
        np.where(rng.rand(h, w) < 0.5, 1.0, 0.5).astype(np.float32)),)
    hist = jnp.asarray(rng.rand(4, h, w).astype(np.float32))
    if with_velocity:
        vel = (
            jnp.asarray((rng.rand(h, w) - 0.5).astype(np.float32) * 0.01),
            jnp.asarray((rng.rand(h, w) - 0.5).astype(np.float32) * 0.01),
        )
    else:
        vel = None
    return cur, hist, vel


def _compare(h, w, with_velocity):
    cur, hist, vel = _mk_inputs(h, w, with_velocity=with_velocity)
    (r0, g0, b0), nh0 = taa.temporal_aa(cur, hist, vel, use_pallas=False)
    (r1, g1, b1), nh1 = taa.temporal_aa(cur, hist, vel, use_pallas=True)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(nh0), np.asarray(nh1), atol=2e-5)


def test_taa_pallas_matches_jnp_no_velocity():
    # 72 x 200: exercises both row-band and lane padding/cropping
    _compare(72, 200, with_velocity=False)


def test_taa_pallas_matches_jnp_velocity():
    _compare(64, 128, with_velocity=True)


def test_taa_windowed_reprojection_matches_full():
    """With velocity zero outside the window, the windowed packed-row
    reprojection must equal the full-screen path."""
    h, w = 96, 160
    rng = np.random.RandomState(5)
    cur = tuple(jnp.asarray(rng.rand(h, w).astype(np.float32))
                for _ in range(3)) + (
        jnp.asarray(np.ones((h, w), np.float32)),)
    hist = jnp.asarray(rng.rand(4, h, w).astype(np.float32))
    vel_np = np.zeros((2, h, w), np.float32)
    vel_np[:, 30:60, 50:100] = (rng.rand(2, 30, 50) - 0.5) * 0.02
    vel = (jnp.asarray(vel_np[0]), jnp.asarray(vel_np[1]))

    out_full, nh_full = taa.temporal_aa(cur, hist, vel)
    out_win, nh_win = taa.temporal_aa(
        cur, hist, vel, reproj_center=(jnp.asarray(75.0), jnp.asarray(45.0)),
        reproj_window=64)
    # the mesh window (30:60, 50:100) sits fully inside the 64px window
    # centred at (75, 45); dilation spreads 1 px
    np.testing.assert_allclose(
        np.asarray(nh_win), np.asarray(nh_full), atol=2e-5)
