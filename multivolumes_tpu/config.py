"""Engine configuration.

Mirrors the reference's compile-time constants (`Content/SharedConsts.h:5-10`)
and hand-parsed CLI defaults (`MultiVolumes/MultiVolumes.cpp:27-68,543-613`)
as one frozen dataclass, so a whole scene is reconstructible from a config —
the reference is likewise stateless beyond its flags.
"""

from __future__ import annotations

import dataclasses
import math


class SharedConsts:
    """Compile-time constants shared by host and kernels.

    Reference: `MultiVolumes/Content/SharedConsts.h:5-10` and
    `Content/Shaders/RayMarch.hlsli:11-17`.
    """

    GROUP_VOLUME_COUNT = 4
    NUM_CUBE_MIP = 5
    NUM_OIT_LAYERS = 8
    Z_NEAR = 1.0
    Z_FAR = 1000.0

    ABSORPTION = 0.8
    ZERO_THRESHOLD = 0.01
    MAX_DIST = 2.0 * math.sqrt(3.0)  # diameter of the [-1,1]^3 cube

    # Render scheme bit in VolumeInfo.MaskBits (`Common.hlsli:12`)
    CUBEMAP_RAYMARCH_BIT = 1 << 15

    FOV_ANGLE_Y = math.pi / 4.0  # `MultiVolumes.cpp` g_FOVAngleY


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Scene/engine knobs, mirroring the reference CLI.

    Reference flag parsing: `MultiVolumes/MultiVolumes.cpp:543-613`;
    defaults: `MultiVolumes.cpp:27-68`.
    """

    width: int = 1280
    height: int = 800

    grid_size: int = 128        # -gridSize: density volume resolution
    light_grid_size: int = 96   # -lightGridSize: light map resolution
    max_ray_samples: int = 256  # -maxRaySamples
    max_light_samples: int = 96  # -maxLightSamples
    num_volumes: int = 2        # -numVolumes (2..64 in demos)

    # Number of distinct source density textures; volumes index into these
    # (reference: 10 DDS files cycled, `MultiVolumes.cpp:60-69`).
    num_volume_srcs: int = 2

    cube_map_size: int = 128    # per-volume cube-map top-mip resolution
    num_cube_mips: int = SharedConsts.NUM_CUBE_MIP
    oit_layers: int = SharedConsts.NUM_OIT_LAYERS

    # Scene placement: -volume x y z scale (`MultiVolumes.cpp:38,59`)
    vol_pos_scale: tuple[float, float, float, float] = (0.0, 0.0, 0.0, 10.0)
    # Mesh placement: -mesh file x y z scale (`MultiVolumes.cpp:39,55`)
    mesh_pos_scale: tuple[float, float, float, float] = (0.0, -9.0, 0.0, 1.8)

    show_mesh: bool = False
    has_light_probe: bool = True
    # `_POINT_LIGHT_` shader switch (`CSRayMarchL.hlsl:87-92`): treat
    # light_pos as a point (per-voxel direction) instead of a direction.
    # Point lights need the per-voxel gather march, so light_mode falls
    # back to "reference" when set.
    point_light: bool = False
    adaptive_raymarch: bool = True  # `_ADAPTIVE_RAYMARCH_`, Common.hlsli:13

    shadow_map_size: int = 1024  # `ObjectRenderer.cpp:80-83`

    # Compute dtype for the sweep kernels. The reference's shaders compute
    # in min16float (half precision) throughout; bfloat16 is the TPU
    # equivalent (verified within 5e-3 of f32 in tests). f32 available for
    # golden comparisons.
    use_bf16: bool = True

    # View-march algorithm: "sweep" = MXU plane-sweep (TPU-native fast
    # path, see render/sweep.py); "reference" = gather-based masked scan
    # matching `CSRayMarch.hlsl` step-for-step (golden/debug path).
    march_mode: str = "sweep"
    # Plane count for the sweep (None -> cube_map_size).
    sweep_planes: int | None = None
    # Light-map algorithm: "sweep" = shear-warp transmittance propagation
    # (render/lightsweep.py); "reference" = gather-march, 1 volume/frame
    # (render/lightmarch.py).
    light_mode: str = "sweep"
    # Temporal amortization for the sweep light maps: refresh this many
    # volumes per frame round-robin. 1 is the reference's exact cadence
    # (`CSRayMarchL.hlsl:31-32` marches `g_frameIdx % count` — ONE
    # volume per frame; at n=64 each map is 64 frames stale). What goes
    # stale between refreshes is only each map's mesh-shadow/incoming-
    # occlusion term — the same lag the reference's round-robin has.
    # Inter-volume occlusion stays exact via cached outgoing
    # footprints — see lightsweep.ray_march_light_sweep_update. 0 = all
    # volumes every frame. At demo counts <= 1 this is a full refresh.
    light_refresh: int = 1
    # Shear-warp sweep axis, derived HOST-SIDE from the light direction
    # (argmax |dir|) by the engine when the light is set: the light is a
    # scene setting, not per-frame data, so baking the axis into the
    # traced graph replaces a 3-branch lax.switch (~0.3 ms/frame of
    # conditional copies at n=64, and 3x the compiled light code). None
    # keeps the data-dependent switch (twins/tests).
    light_axis: int | None = None
    # Multi-chip MEMORY scaling (opt-in): shard the per-volume light
    # stacks (light_maps / light_maps_oriented / light_sout — the
    # dominant carried state, ~1.4 GB oriented at demo scale) over the
    # device mesh's "volumes" axis instead of replicating. The sharded
    # view sweep reads its LOCAL shard (no per-frame collective moves
    # a stack; pinned by tests/test_sharding_placement.py), and the
    # cohort refresh updates stay shard-local masked writes. Default
    # off: single-chip and small meshes prefer replication (zero
    # resharding risk, identical math).
    shard_light_stacks: bool = False
    # Pack cube-map RGBA as f16 pairs before compositing (halves the
    # dominant per-pixel gather cost; ~3-digit precision).
    packed_composite: bool = True
    # LOD bucket capacities for the sweep (volumes sorted by projected
    # mip; bucket i sweeps at cube_map_size >> i). None disables LOD
    # bucketing (all volumes at full resolution).
    lod_bucket_caps: tuple | None = (8, 24, 1 << 30)
    # Screen composite algorithm: "warp" = per-volume separable projective
    # warps on the MXU (render/warp.py, zero gathers); "gather" = per-pixel
    # CubeCast gathers (render/composite.py, reference-exact filter);
    # "auto" = warp whenever the sweep path is active (cube maps shade
    # everything), gather otherwise.
    composite_mode: str = "auto"
    # Base per-volume screen tile (pixels) for the warp composite's
    # non-mip-0 classes; mip-0 volumes get a footprint ladder (2 at full
    # screen, 4 at 3/5, rest at 2/5 — see warp.composite_oit_warp) and a
    # volume's footprint is clipped to its tile. None -> auto from
    # num_volumes (512 for <=8 volumes, 384 beyond).
    warp_tile: int | None = None
    # Sky (environment) pass resolution divisor: the radiance cube is
    # low-frequency, so sampling it per output pixel is wasted gathers —
    # render at 1/sky_scale and bilinear-upsample with two matmuls.
    # (Clamped so the low-res pass keeps >= ~160 columns; small
    # viewports render the sky near full resolution regardless.)
    sky_scale: int = 8
    # Backface-cull the opaque mesh's base/depth raster (the reference's
    # default CULL_BACK raster state). Culled triangles emit no scatter
    # samples, and the raster's sample budget is capacity-limited to
    # 50% of the triangle count (the bunny measures a 43% front-facing
    # max over a full orbit). Set False for open single-sided geometry:
    # every triangle then rasterizes from both sides at full capacity.
    mesh_backface_cull: bool = True
    # Raster small-triangle tail tier (frac, kk): the smallest `frac`
    # of emitted triangles samples at kk x kk instead of 4x4 (~2 ms at
    # the demo config). SAFE when the median triangle is ~<= kk px
    # (demo-orbit distances); a strongly zoomed-in camera (median
    # bbox >> kk) under-samples those triangles — set None for
    # close-up-heavy content. Capacity/cull/tier levers stay exact at
    # any distance (pinned by test).
    raster_tail: tuple | None = (0.6, 2)
    # Raster tier ladder selection: "near" = the all-distance ladder
    # (tiers sized so any close-up keeps stride <= 1 px; pinned by
    # tests/test_passes.py close-up contract); "far" = the mesh-derived
    # demo-distance ladder `raster_far_tiers` (valid while the mesh's
    # projected bbox stays <= raster_far_bound px). The reference's
    # hardware rasterizer pays per covered pixel, so its cost tracks
    # projected size natively; the scatter rasterizer gets the same
    # behavior from a HOST-side preset pick per frame
    # (engine.select_raster_preset — a static jit key, never a traced
    # branch). "near" is always safe.
    raster_preset: str = "near"
    # Mesh-specific far-distance tier ladder, derived at set_mesh time
    # from the mesh's own per-rank bbox profile at raster_far_bound
    # (mesh.derive_far_tiers). None = far preset unavailable.
    raster_far_tiers: tuple | None = None
    # The far ladder's small end: absolute rank spans ((start, kk), ...)
    # replacing the fixed-fraction raster_tail under the far preset —
    # sub-2 px ranks emit ONE sample (see mesh.derive_far_tiers).
    raster_far_small: tuple | None = None
    # Projected-bbox bound (px) under which the far ladder keeps every
    # tier's sample stride <= 1 px. The demo orbit projects the bunny at
    # <= ~313 px (1280x800), so 360 covers it with margin.
    raster_far_bound: int = 360
    # Static window (px) for TAA's velocity-based history reprojection,
    # centred on the mesh (the only velocity writer); pixels outside
    # reproject as identity. 0 = full-screen reprojection. Applies ONLY
    # under the far raster preset (whose host pick guarantees the mesh
    # projects inside raster_far_bound <= window); the near preset
    # reprojects full-screen — no silent identity fallback for a mesh
    # that outgrew the window. Default matches mesh_shade_window: the
    # pick HOLDS the far preset to 1.05x the bound (hysteresis ceiling
    # 378 px at the default 360), velocity dilation adds ~10 px of
    # orbit motion — so the window must cover ceil(1.05*bound)+dilation
    # (388 px at defaults), not the bare bound. 416 = that ceiling
    # rounded up to a 32-px step; the quad-row history gather is
    # ~0.9 ms at 448 px (traced), 416^2/384^2 = 1.17x the old bill.
    taa_reproj_window: int = 416
    # Static window (px) for the mesh's deferred shade (plane-table
    # interpolation, shadow PCF, BRDF), centred on the mesh's projected
    # bbox. The per-pixel gathers are the mesh pass's screen-space cost;
    # the mesh covers a fraction of the frame. Applies ONLY under the
    # far raster preset, whose host-side pick guarantees the projected
    # bbox <= raster_far_bound <= window — the near preset shades
    # full-screen, so a mesh can never silently show background outside
    # a window it outgrew. The far dense_top raster pass evaluates in
    # the same window. Default = raster_far_bound rounded up to a lane
    # multiple (the pick guarantee makes a larger window pure waste).
    mesh_shade_window: int = 384
    # Debug mode: checkify isfinite guards after the bf16 fast path's
    # two accumulation points (view sweep, OIT composite) — the analog
    # of the reference's TAA NaN guard (`CSTemporalAA.hlsl:327`) plus
    # the D3D debug layer's validation stance (SURVEY section 5). OFF by
    # default: the check forces a device sync per frame through
    # `err.throw()` (~30 ms on this host's tunnel). The full-frame
    # fidelity gate runs with it ON.
    debug_finite: bool = False
    # Composite the volume layers at 1/composite_scale screen resolution
    # and upsample (the cube maps carry the detail — the screen pass is a
    # filter, per the paper's viewport-resolution-independence thesis).
    # 1 = full resolution (reference fidelity).
    composite_scale: int = 1

    @property
    def viewport(self) -> tuple[int, int]:
        return (self.width, self.height)

    @property
    def aspect_ratio(self) -> float:
        return self.width / self.height

    def with_(self, **kwargs) -> "RenderConfig":
        return dataclasses.replace(self, **kwargs)
