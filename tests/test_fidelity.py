"""End-to-end fidelity gate: production fast path vs reference semantics.

BASELINE.md budgets "within 1e-2 of the DX12 reference". The DX12 exe
cannot run here and its volume assets are stripped, so the attainable
anchor is the reference-SEMANTICS twin chain — gather march
(`CSRayMarch.hlsl:77-158`), per-volume gather light march
(`CSRayMarchL.hlsl`), CubeCast gather composite (`PSCube.hlsli:51-108`),
all f32 — rendered through the SAME full frame function as the
production path (bf16 plane-sweep march + amortized shear-warp light +
Pallas tile composite). This is the one-number accumulated-deviation
check the per-component tests (test_sweep / test_lightsweep / test_warp)
cannot provide.

The reference light march amortizes one volume per frame, so the twin
warms up for N frames (all maps marched) before the comparison frame.
"""

import numpy as np
import jax

from multivolumes_tpu.config import RenderConfig
from multivolumes_tpu.core import camera as cam_lib
from multivolumes_tpu.render import frame as frame_lib
from multivolumes_tpu.scene import state as state_lib

_FAST = RenderConfig(
    width=160, height=96, grid_size=32, light_grid_size=16,
    max_ray_samples=32, max_light_samples=8,
    num_volumes=8, num_volume_srcs=2, cube_map_size=16,
    shadow_map_size=64,
)  # production defaults: sweep march (bf16), sweep light, tile composite
# (VERDICT round-3 item 6 raised the CPU gate from grid 16 / 4 volumes;
# the demo-scale number lives in docs/ROADMAP.md "Fidelity at scale")


def _render(cfg, warmup_frames, camera):
    state = state_lib.create_scene(cfg)
    step = jax.jit(lambda s, c: frame_lib.render_frame(
        s, c, cfg, use_taa=False))
    for f in range(warmup_frames):
        out = step(state, cam_lib.orbit_camera(f / 60.0, cfg.aspect_ratio))
        state = out.state
    return np.asarray(step(state, camera).image)


def test_full_frame_fast_vs_reference_semantics():
    cfg_ref = _FAST.with_(
        march_mode="reference", light_mode="reference",
        composite_mode="gather", packed_composite=False, use_bf16=False,
    )
    camera = cam_lib.orbit_camera(0.35, _FAST.aspect_ratio)

    # warm the reference twin until every volume's light map is marched
    ref = _render(cfg_ref, cfg_ref.num_volumes, camera)
    fast = _render(_FAST, 0, camera)

    diff = np.abs(fast - ref)
    covered = diff.max(-1) > 0  # pixels either path touched differently
    mean_all = diff.mean()
    p99 = np.percentile(diff, 99)
    assert mean_all < 1e-2, f"fidelity gate: mean {mean_all:.2e}"
    # measured attribution at this scale (grid 32, light grid 16, 8
    # volumes): march+composite p99 is 6e-3; the tail (p99 ~5e-2, ~1.3%
    # of pixels) is ENTIRELY the light path — the shear-warp sweep's
    # documented AO-fan + sheared-shadow approximations, which the
    # sub-gate below pins separately. The coarse 16-voxel light grid
    # magnifies them (demo scale is 96).
    assert p99 < 8e-2, f"fidelity gate: p99 {p99:.2e} max {diff.max():.2e}"
    # the scene must actually exercise the volume path
    assert covered.mean() > 0.05

    # sub-gate: fast march + composite against the reference twin with
    # BOTH consuming the reference's light maps — the view path alone
    # must hold the 1e-2 budget at p99, not just in the mean
    mix = _render(_FAST.with_(light_mode="reference", use_bf16=False),
                  _FAST.num_volumes, camera)
    diff_m = np.abs(mix - ref)
    p99_m = np.percentile(diff_m, 99)
    assert diff_m.mean() < 1e-3, f"march sub-gate: mean {diff_m.mean():.2e}"
    assert p99_m < 1e-2, f"march sub-gate: p99 {p99_m:.2e}"


def test_banded_ref_frame_matches_full():
    """Banded off-center-projection rendering (cam_lib.band_camera — the
    shape tools/fidelity_demo.py uses to keep each demo-scale
    reference-twin dispatch seconds long) must reproduce the full-frame
    reference render exactly up to band-local reassociation: per-pixel
    passes see identical pixel centres by construction; residuals are
    fast-math noise, not geometry."""
    cfg = _FAST.with_(
        march_mode="reference", light_mode="reference",
        composite_mode="gather", packed_composite=False, use_bf16=False,
    )
    camera = cam_lib.orbit_camera(0.35, cfg.aspect_ratio)
    state = state_lib.create_scene(cfg)
    # one warm frame so a light cohort is marched (any state works: both
    # renders below consume the SAME state)
    state = jax.jit(lambda s, c: frame_lib.render_frame(
        s, c, cfg, use_taa=False))(state, camera).state

    full = np.asarray(jax.jit(lambda s: frame_lib.render_frame(
        s, camera, cfg, use_taa=False).image)(state))

    bands = 4
    cfg_b = cfg.with_(height=cfg.height // bands)
    band_fn = jax.jit(lambda s, cam: frame_lib.render_frame(
        s, cam, cfg_b, use_taa=False).image)
    parts = [np.asarray(band_fn(state, cam_lib.band_camera(
        camera, k, bands))) for k in range(bands)]
    banded = np.concatenate(parts, axis=0)

    assert banded.shape == full.shape
    diff = np.abs(banded - full)
    assert diff.mean() < 1e-5, diff.mean()
    assert diff.max() < 1e-2, diff.max()


def test_debug_finite_guard_catches_injected_inf():
    """VERDICT round-3 item 9: the debug-mode isfinite sentinels
    (config.debug_finite) must (a) pass clean on a demo scene and (b)
    raise a NAMED error when a source volume carries an Inf — instead of
    silently propagating it through the bf16 exp2/log2 march to the
    screen. (The reference NaN-guards only its TAA accumulation point,
    `CSTemporalAA.hlsl:327`.)"""
    import dataclasses

    import jax.numpy as jnp
    import pytest
    from jax.experimental import checkify

    cfg = _FAST.with_(debug_finite=True)
    camera = cam_lib.orbit_camera(0.35, cfg.aspect_ratio)
    state = state_lib.create_scene(cfg)
    step = jax.jit(checkify.checkify(lambda s, c: frame_lib.render_frame(
        s, c, cfg, use_taa=False)))

    err, out = step(state, camera)
    err.throw()  # clean scene: no error
    assert np.isfinite(np.asarray(out.hdr)).all()

    # VERDICT's exact scenario: an Inf in a carried LIGHT MAP (the light
    # value multiplies scatter color unclamped; volume densities, by
    # contrast, are clamp-sanitized by the march). Poison a volume the
    # frame-0 cohort does NOT refresh, through the oriented carry the
    # production march actually reads.
    from multivolumes_tpu.render import sweep as sweep_lib

    bad_lm = state.light_maps.at[3, :, 2:6, 2:6, 2:6].set(jnp.inf)
    bad = dataclasses.replace(
        state, light_maps=bad_lm,
        light_maps_oriented=sweep_lib.pad_light_lanes(
            sweep_lib.orient_variants_cf(
                bad_lm.astype(state.light_maps_oriented.dtype))))
    err, _ = step(bad, camera)
    with pytest.raises(Exception, match="non-finite"):
        err.throw()


def test_tile_composite_adversarial_near_camera():
    """8+ near-camera volumes with near-full-screen footprints: the warp
    path clipped footprints to per-volume tiles here (round-2 weak item
    5); the tile kernel's per-tile lists have full capacity N, so the
    production composite must stay within the gather path's tolerance
    with every footprint overlapping most of the screen."""
    import dataclasses

    import jax.numpy as jnp

    cfg = RenderConfig(
        width=128, height=96, grid_size=16, light_grid_size=8,
        max_ray_samples=16, max_light_samples=8,
        num_volumes=9, num_volume_srcs=2, cube_map_size=16,
        shadow_map_size=32, use_bf16=False, packed_composite=False,
        composite_mode="gather",
    )
    st = state_lib.create_scene(cfg)
    # cluster all 9 volumes right in front of the default camera
    rng = np.random.RandomState(7)
    worlds = np.zeros((9, 4, 4), np.float32)
    for i in range(9):
        s = 6.0 + rng.rand() * 4.0
        worlds[i] = np.eye(4)
        worlds[i, 0, 0] = worlds[i, 1, 1] = worlds[i, 2, 2] = s * 0.5
        worlds[i, 3, :3] = rng.randn(3) * 2.0
    st = dataclasses.replace(st, volume_worlds=jnp.asarray(worlds))
    cam = cam_lib.default_camera(cfg.aspect_ratio)

    out_g = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg, use_taa=False))(st)
    cfg_t = cfg.with_(composite_mode="tile")
    out_t = jax.jit(lambda s: frame_lib.render_frame(
        s, cam, cfg_t, use_taa=False))(st)
    diff = np.abs(np.asarray(out_g.image) - np.asarray(out_t.image))
    assert diff.mean() < 3e-3, diff.mean()
    assert np.percentile(diff, 99.5) < 3e-2, np.percentile(diff, 99.5)
