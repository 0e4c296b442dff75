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


def test_reproj_window_boundary_fallback():
    """A velocity writer larger than the reprojection window (round-2
    weak item 6): pixels INSIDE the window must reproject exactly like
    the full-screen path; pixels OUTSIDE must fall back to the
    UNREPROJECTED history resolve (the documented degradation — no
    garbage, no crash). The window is centred on reproj_center."""
    h, w = 64, 128
    win = 32
    cur, hist, _ = _mk_inputs(h, w, seed=3)
    # uniform 2px-right motion everywhere — a "mesh" covering the screen
    vel = (jnp.full((h, w), 2.0 / w, jnp.float32),
           jnp.zeros((h, w), jnp.float32))
    center = (w / 2.0, h / 2.0)

    (_, _, _), nh_win = taa.temporal_aa(
        cur, hist, vel, use_pallas=True,
        reproj_center=center, reproj_window=win)
    (_, _, _), nh_full = taa.temporal_aa(cur, hist, vel, use_pallas=True)
    (_, _, _), nh_none = taa.temporal_aa(cur, hist, None, use_pallas=True)

    x0, y0 = (w - win) // 2, (h - win) // 2
    inside = np.zeros((h, w), bool)
    inside[y0:y0 + win, x0:x0 + win] = True
    # interior of the window (velocity_max dilates 1px at the seam)
    core = np.zeros((h, w), bool)
    core[y0 + 2:y0 + win - 2, x0 + 2:x0 + win - 2] = True

    nh_win, nh_full, nh_none = map(np.asarray, (nh_win, nh_full, nh_none))
    np.testing.assert_allclose(nh_win[:, core], nh_full[:, core],
                               atol=1e-5)
    np.testing.assert_allclose(nh_win[:, ~inside], nh_none[:, ~inside],
                               atol=1e-5)
