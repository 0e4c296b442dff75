"""Engine facade: the `MultiRayCaster`-shaped public API.

Mirrors the reference's component interfaces (`Content/MultiRayCaster.h:
31-50`, `ObjectRenderer.h`, `LightProbe.h`) over the functional core:
`init / load_volume / init_volume / set_volumes_world / set_volume_world /
set_max_samples / set_light / set_ambient / set_sh / update_frame / render`.
State mutations rebuild the SceneState pytree; `render` is one cached jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multivolumes_tpu.config import RenderConfig
from multivolumes_tpu.core import camera as camera_lib
from multivolumes_tpu.core import math3d, sh as sh_lib
from multivolumes_tpu.render import frame as frame_lib
from multivolumes_tpu.scene import io_obj, state as state_lib, volume as volume_lib


from functools import partial


@partial(jax.jit, static_argnums=(1, 2, 3))
def _refresh_light_jit(state, has_mesh: bool, max_light_samples: int,
                       has_light_probe: bool):
    """Jitted full light refresh (module-level so the jit cache survives
    across engine setter calls — a per-call closure would retrace, which
    on this host means a remote compile per set_light)."""
    from multivolumes_tpu.render import lightsweep
    from multivolumes_tpu.render import mesh as mesh_lib
    from multivolumes_tpu.render import sweep as sweep_lib
    from multivolumes_tpu.render.perframe import build_per_object

    po = build_per_object(state.volume_worlds, jnp.eye(4, dtype=jnp.float32))
    maps, sout = lightsweep.ray_march_light_sweep_update(
        state.rho_light, state.ao_static, state.grad_dir,
        state.vol_tex_ids, po,
        state.mesh_shadow_map if has_mesh else None,
        mesh_lib.shadow_view_proj(state),
        state.light_pos, state.light_color, state.ambient,
        state.sh_coeffs, max_light_samples,
        has_light_probe=has_light_probe,
    )
    return (maps.astype(state.light_maps.dtype),
            sweep_lib.pad_light_lanes(sweep_lib.orient_variants_cf(
                maps.astype(state.light_maps_oriented.dtype))),
            sout)


class MultiRayCaster:
    """Volume-rendering engine with the reference's host API."""

    def __init__(self, config: RenderConfig):
        self.config = config
        self.state = state_lib.create_scene(config)
        # jit cache per (config, use_taa): configs the host flips
        # between per frame (raster_preset) each keep their own
        # compiled step instead of retracing on every flip
        self._render_jits: dict = {}
        self._mesh_aabb = None        # world AABB (2, 3), host numpy
        self._set_light_axis()

    def _set_light_axis(self) -> None:
        """Bake the shear-warp sweep axis (argmax |light dir|) into
        config: the light is a host-side scene setting, so the axis is
        known at trace time — the sweep then skips its data-dependent
        3-branch lax.switch (config.light_axis). Axis changes retrace
        (<= 3 cache entries ever)."""
        if self.config.light_mode != "sweep":
            return
        ax, ay, az = np.abs(np.asarray(self.state.light_pos[:3]))
        # tie order matches the traced pick in lightsweep (z, then y)
        axis = 2 if (az >= ax and az >= ay) else (1 if ay >= ax else 0)
        self.config = self.config.with_(light_axis=axis)

    # --- MultiRayCaster API (`MultiRayCaster.h:31-50`) -------------------

    def load_volume_data(self, i: int, density: np.ndarray) -> None:
        """R32F density grid -> volume source i (`LoadVolumeData`,
        `MultiRayCaster.cpp:168-209`)."""
        vol = volume_lib.r32f_to_rgba(density, self.state.volumes.dtype)
        self._set_volume(i, vol)

    def load_volume_file(self, i: int, path: str) -> None:
        """DDS R32F volume file -> volume source i, the full
        `LoadVolumeData` path (`MultiRayCaster.cpp:168-209`: DDS::Loader
        parse + `CSR32FToRGBA16F` convert)."""
        from multivolumes_tpu.scene import io_dds

        tex = io_dds.load_dds(path)
        if not tex.is_volume or tex.data.shape[-1] != 1:
            raise ValueError(f"{path}: not an R32F volume DDS")
        self.load_volume_data(i, tex.data[..., 0])

    def set_radiance_file(self, path: str) -> None:
        """DDS radiance cube -> environment + SH projection
        (`LightProbe::Init`, `LightProbe.cpp:29-61`)."""
        from multivolumes_tpu.scene import io_dds

        tex = io_dds.load_dds(path)
        if not tex.is_cube:
            raise ValueError(f"{path}: not a cube-map DDS")
        rad = np.asarray(tex.data, np.float32)[..., :3]
        self.set_radiance(jnp.asarray(rad))

    def init_volume_data(self, i: int) -> None:
        """Procedural volume (`InitVolumeData`, `MultiRayCaster.cpp:243-264`)."""
        vol = volume_lib.init_grid_data(self.config.grid_size,
                                        self.state.volumes.dtype)
        self._set_volume(i, vol)

    def _set_volume(self, i: int, vol) -> None:
        from multivolumes_tpu.render import lightsweep

        volumes = self.state.volumes.at[i].set(vol)
        rho, ao, gd = jax.jit(
            lightsweep.precompute_static, static_argnums=(1, 2)
        )(volumes, self.config.light_grid_size, self.config.max_light_samples)
        oriented = state_lib.orient_sources(volumes, self.config)
        self.state = dataclasses.replace(
            self.state, volumes=volumes,
            volumes_oriented=oriented,
            vol_zmax=state_lib.slab_density_max(oriented),
            rho_light=rho, ao_static=ao, grad_dir=gd,
        )
        self._refresh_light_cache()

    def _refresh_light_cache(self) -> None:
        """Full light-map refresh (all volumes) after a setter that
        invalidates the amortized per-frame cohort state: density upload,
        light/ambient/SH change, or a new mesh shadow map. The cached
        outgoing footprints (`light_sout`) depend on density + light
        direction + scale, so world moves alone do NOT require this."""
        if self.config.light_mode != "sweep":
            return
        st = self.state
        maps, oriented, sout = _refresh_light_jit(
            st, st.mesh_indices.shape[0] > 1,
            self.config.max_light_samples, self.config.has_light_probe)
        self.state = dataclasses.replace(
            st, light_maps=maps, light_maps_oriented=oriented,
            light_sout=sout,
        )

    def set_volumes_world(self, size: float, center) -> None:
        worlds = state_lib.volume_grid_worlds(
            self.config.num_volumes, size, center
        )
        self._check_worlds(worlds)
        self.state = dataclasses.replace(
            self.state, volume_worlds=jnp.asarray(worlds)
        )

    def _check_worlds(self, worlds) -> None:
        """The shear-warp light sweep (`render/lightsweep.py`) assumes
        uniform-scale, rotation-free volume worlds (it reads world[0,0] as
        THE scale); rotated/anisotropic worlds would silently shadow
        wrong. Validate at the API boundary (host-side, outside jit)."""
        if self.config.light_mode != "sweep":
            return
        w = np.asarray(worlds, np.float32).reshape(-1, 4, 4)
        upper = w[:, :3, :3]
        s = upper[:, 0, 0]
        expect = s[:, None, None] * np.eye(3, dtype=np.float32)
        if not np.allclose(upper, expect, atol=1e-5 * np.abs(s).max()):
            raise ValueError(
                "light_mode='sweep' requires uniform-scale, unrotated "
                "volume worlds; use light_mode='reference' for rotated or "
                "anisotropic volumes (see render/lightsweep.py)"
            )

    def set_volume_world(self, i: int, size: float, pos) -> None:
        half = size * 0.5
        w = math3d.scaling(half) @ math3d.translation(jnp.asarray(pos, jnp.float32))
        self._check_worlds(w[None])
        self.state = dataclasses.replace(
            self.state, volume_worlds=self.state.volume_worlds.at[i].set(w)
        )

    def set_max_samples(self, max_ray_samples: int, max_light_samples: int) -> None:
        self.config = self.config.with_(
            max_ray_samples=max_ray_samples, max_light_samples=max_light_samples
        )
        self._render_jits.clear()

    def set_light(self, pos, color, intensity: float) -> None:
        self.state = dataclasses.replace(
            self.state,
            light_pos=jnp.asarray([*pos, 1.0], jnp.float32),
            light_color=jnp.asarray([*color, intensity], jnp.float32),
        )
        self._set_light_axis()
        self._refresh_shadow_map()
        self._refresh_light_cache()

    def _refresh_shadow_map(self) -> None:
        """Re-rasterize the cached light-view shadow map (the reference
        renders it per frame; mesh/light/world are static between
        setter calls here)."""
        if self.state.mesh_indices.shape[0] <= 1:
            return
        from multivolumes_tpu.render import mesh as mesh_lib

        sm = jax.jit(
            mesh_lib.render_shadow_map, static_argnums=(1,)
        )(self.state, self.config)
        self.state = dataclasses.replace(
            self.state, mesh_shadow_map=sm,
            mesh_shadow_quads=jax.jit(mesh_lib.build_shadow_quads)(sm),
        )

    def set_ambient(self, color, intensity: float) -> None:
        self.state = dataclasses.replace(
            self.state, ambient=jnp.asarray([*color, intensity], jnp.float32)
        )
        self._refresh_light_cache()

    def set_sh(self, sh_coeffs) -> None:
        self.state = dataclasses.replace(
            self.state, sh_coeffs=jnp.asarray(sh_coeffs, jnp.float32)
        )
        self._refresh_light_cache()

    def set_radiance(self, radiance) -> None:
        """Radiance env + SH projection (`LightProbe::TransformSH`)."""
        radiance = jnp.asarray(radiance)
        self.state = dataclasses.replace(
            self.state,
            radiance=radiance,
            sh_coeffs=sh_lib.project_cube_map(radiance),
        )
        self._refresh_light_cache()

    def set_mesh(self, path: str) -> None:
        """OBJ mesh + world placement (`ObjectRenderer::Init`)."""
        from multivolumes_tpu import native
        from multivolumes_tpu.render import mesh as mesh_lib

        mesh = native.load_obj_native(path) or io_obj.load_obj(path)
        mx, my, mz, ms = self.config.mesh_pos_scale
        self.state = dataclasses.replace(
            self.state,
            mesh_verts=jnp.asarray(mesh.vertices),
            mesh_indices=jnp.asarray(mesh.indices),
            mesh_world=math3d.scaling(ms)
            @ math3d.translation(jnp.array([mx, my, mz], jnp.float32)),
            scene_size=jnp.asarray(mesh.scene_size * ms, jnp.float32),
        )
        # host-side copies for the per-frame raster-preset pick: the
        # world AABB (projected size estimate) and the mesh-derived
        # far tier ladder (see mesh.derive_far_tiers)
        verts_np = np.asarray(mesh.vertices, np.float32)[:, :3] * ms \
            + np.asarray([mx, my, mz], np.float32)
        self._mesh_aabb = np.stack([verts_np.min(0), verts_np.max(0)])
        ladder = mesh_lib.derive_far_tiers(
            mesh.vertices, mesh.indices, np.asarray(self.state.mesh_world),
            self.config.width, self.config.height,
            self.config.raster_far_bound)
        far_tiers, far_small = ladder if ladder else (None, None)
        self.config = self.config.with_(
            show_mesh=True,
            raster_far_tiers=far_tiers,
            raster_far_small=far_small,
        )
        self._refresh_shadow_map()
        self._refresh_light_cache()
        self._render_jits.clear()

    def select_raster_preset(self, eye, focus=(0.0, 0.0, 0.0)) -> str:
        """Pick the base-raster tier ladder for the NEXT frame from a
        HOST-side camera pose (python floats/numpy — never device
        arrays: a device readback costs ~30 ms here and would serialize
        the pipeline). Hysteresis keeps the pick stable near the bound
        so an orbiting camera doesn't flip-flop jit cache entries.
        Returns the chosen preset name. The reference's hardware
        rasterizer scales work with projected size per-pixel; this is
        the scatter rasterizer's host-level equivalent."""
        from multivolumes_tpu.render import mesh as mesh_lib

        cfg = self.config
        if (self._mesh_aabb is None or not cfg.show_mesh
                or not cfg.raster_far_tiers):
            return cfg.raster_preset
        e = mesh_lib.projected_size_px(
            self._mesh_aabb, eye, focus, cfg.width, cfg.height)
        bound = float(cfg.raster_far_bound)
        # far is valid for e <= bound (derive_far_tiers measures the rank
        # profile AT the bound distance and sizes every tier with a 1.1
        # per-rank margin) — so ENTER far at the bound itself and LEAVE
        # at 1.05x, a hysteresis band that sits inside the ladder margin.
        # An entry threshold below the bound would strand a mesh that
        # projects just under it (the all64 orbit bunny is 332 px of a
        # 360 px bound) on the near preset's full-screen shade forever.
        preset = cfg.raster_preset
        if preset == "far":
            if e > bound * 1.05:
                preset = "near"
        elif e <= bound:
            preset = "far"
        if preset != cfg.raster_preset:
            self.config = cfg.with_(raster_preset=preset)
        return preset

    # --- frame loop -------------------------------------------------------

    def render(self, camera: Optional[camera_lib.Camera] = None,
               use_taa: bool = True) -> jnp.ndarray:
        """Render one frame, advancing the engine state. Returns the
        display-mapped (H, W, 3) image."""
        if camera is None:
            camera = camera_lib.default_camera(self.config.aspect_ratio)
        key = (self.config, use_taa)
        step_jit = self._render_jits.get(key)
        if step_jit is None:
            cfg = self.config

            def step(state, cam):
                # image + state ONLY: returning the full FrameOutput would
                # also materialize the pre-tonemap hdr field, whose
                # channel-last (H, W, 4) store lane-pads 42x on TPU
                # (~0.7 GB/frame of padded stores; hdr consumers call
                # render_frame directly)
                out = frame_lib.render_frame(state, cam, cfg,
                                             use_taa=use_taa)
                return out.image, out.state

            if cfg.debug_finite:
                # checkify-wrapped step: the in-frame isfinite guards
                # raise a named JaxRuntimeError on the host (debug mode;
                # err.throw() forces a sync per frame)
                from jax.experimental import checkify

                inner = jax.jit(checkify.checkify(step))

                def step_jit(state, cam):
                    err, out = inner(state, cam)
                    err.throw()
                    return out
            else:
                # donate the state: the carried buffers (light maps
                # ~1.7 GB, TAA history) update in place per frame
                step_jit = jax.jit(step, donate_argnums=(0,))
            self._render_jits[key] = step_jit
        image, self.state = step_jit(self.state, camera)
        return image

    def render_block(self, cameras, use_taa: bool = True) -> jnp.ndarray:
        """Render K frames in ONE dispatch (`render_frames` lax.scan) —
        the production throughput loop: one host call amortizes this
        1-core host's dispatch overhead over K frames, and the scan
        carry (row-major-pinned, frame.py) updates the light/TAA state
        in place. Measured faster than the per-frame async loop at the
        all64 demo (20.6 vs 21.0 ms/frame, BENCH r4). `cameras` is a
        Camera pytree with a leading K axis (stack per-frame cameras
        with tree_map); returns PLANAR (K, 3, H, W) display images —
        convert channel order on the host (np.moveaxis), never on
        device (docs/ARCHITECTURE.md lane-padding rule)."""
        key = (self.config, use_taa, "block")
        block_jit = self._render_jits.get(key)
        if block_jit is None:
            cfg = self.config
            if cfg.debug_finite:
                # same checkify plumbing as render(): the in-frame
                # isfinite guards must be functionalized before jit or
                # they fail at trace time inside the scan body
                from jax.experimental import checkify

                inner = jax.jit(checkify.checkify(
                    lambda s, c: frame_lib.render_frames(
                        s, c, cfg, use_taa=use_taa)))

                def block_jit(state, cams):
                    err, out = inner(state, cams)
                    err.throw()
                    return out
            else:
                block_jit = jax.jit(
                    lambda s, c: frame_lib.render_frames(s, c, cfg,
                                                         use_taa=use_taa),
                    donate_argnums=(0,))
            self._render_jits[key] = block_jit
        images, self.state = block_jit(self.state, cameras)
        return images


Renderer = MultiRayCaster
