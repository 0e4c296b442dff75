"""Sweep-based light maps: shear-warp transmittance propagation.

TPU-native replacement for the gather-based light march
(`render/lightmarch.py`, the port of `CSRayMarchL.hlsl` + `CastLightRay`):
instead of marching a ray from every light-grid voxel toward the light
through every volume (L^3 x N x samples dependent gathers — the N^2
coupling), propagate transmittance slice by slice along the light
direction's dominant axis:

    T_k(u, v) = T_{k-1}(u - du, v - dv) * (1 - ABSORPTION*rho_{k-1})^f

The per-slice lateral shift (du, dv) is constant, so the recurrence is two
constant interp-matrix multiplies (MXU) and elementwise math per slice —
zero gathers, O(L^3) total per volume. This computes every voxel's
transmittance at once (the classic shear-warp shadow propagation). The
per-frame graph refreshes a COHORT of `config.light_refresh` volumes
round-robin — the reference's own temporal amortization
(`MultiRayCaster::RayMarchL`, one volume/frame), but with exact
inter-volume occlusion via cached outgoing footprints (see
`light_transmittance`); a full refresh is the cohort = all case. The
recurrence factors into a volume-only self term and the advected
incoming occlusion (T_k = advect_k(T_in) * S_k), so the cohort's sweeps
run as two BATCHED L-step scans, and the inter-volume chain is a
vectorized exclusive cumulative product in light order.

Inter-volume shadowing: each volume's outgoing 2D opacity footprint is
composited into a shared lateral occlusion map processed in light order
(volumes sorted by their center's projection onto the light direction);
each volume's incoming occlusion resamples from that map — chains of
occluders compose exactly as in the reference's through-all-volumes
march, up to the slice discretization. The opaque mesh's shadow map is
sampled once per ray on the global lateral grid and becomes a sheared
per-slice depth compare inside the batched scan.

Deviations from the reference (documented, tolerance-tested):
- continuous opacity-corrected extinction instead of per-sample updates
  (same model as render/sweep.py; equal at dt == stepScale);
- ambient occlusion uses a short fixed-tap march along the density
  gradient instead of a full per-volume AO ray fan (`CSRayMarchL.hlsl:
  99-108`); inter-volume AO coupling approximated by the light-direction
  occlusion map;
- the T = advect(T_in) * S factorization and the sheared shadow compare
  commute interpolation with products — sub-texel smoothing-level
  differences vs the per-voxel reference (tests/test_lightsweep.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multivolumes_tpu.config import SharedConsts
from multivolumes_tpu.ops.trilinear import indexed_trilinear_soa
from multivolumes_tpu.render.cull import CullResult
from multivolumes_tpu.render.perframe import PerObject
from multivolumes_tpu.core import sh as sh_lib

ABSORPTION = SharedConsts.ABSORPTION
ZERO_THRESHOLD = SharedConsts.ZERO_THRESHOLD
MAX_DIST = SharedConsts.MAX_DIST


def _interp_matrix_shift(n: int, shift, dtype=jnp.float32):
    """(n, n) linear-resample matrix for a constant index shift.

    out[i] = in[i - shift] with linear interpolation and clamp addressing;
    shift is a traced scalar (fraction of a voxel per slice step).
    """
    rows = jax.lax.broadcasted_iota(jnp.float32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (n, n), 1)
    src = jnp.clip(rows - shift, 0.0, n - 1.0)
    return jnp.maximum(1.0 - jnp.abs(src - cols), 0.0).astype(dtype)


def _resample_matrix(n_out: int, n_in: int, scale, offset, dtype=jnp.float32):
    """(n_out, n_in) linear resample: src coord = i*scale + offset."""
    rows = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 1)
    src = jnp.clip(rows * scale + offset, 0.0, n_in - 1.0)
    return jnp.maximum(1.0 - jnp.abs(src - cols), 0.0).astype(dtype)


def densities_at_light_grid(volumes, l: int):
    """Resample each source's density channel to the light grid:
    (N_src, D, H, W, 4) -> (N_src, L, L, L). Separable matmuls."""
    n_src, d, h, w = volumes.shape[:4]
    rho = volumes[..., 3]  # (N_src, D, H, W)

    def axis_mat(nn):
        # light-grid voxel centers -> source texel coords
        return _resample_matrix(l, nn, nn / l, 0.5 * nn / l - 0.5)

    mz, my, mx = axis_mat(d), axis_mat(h), axis_mat(w)
    out = jnp.einsum("ad,sdhw->sahw", mz, rho)
    out = jnp.einsum("bh,sahw->sabw", my, out)
    out = jnp.einsum("cw,sabw->sabc", mx, out)
    return out  # (N_src, L, L, L) indexed [z, y, x]


def light_transmittance(
    rho_light,       # (C, L, L, L) density at the refreshed volumes' grids
    per_object: PerObject,
    light_dir_world,  # (3,) unit, pointing TOWARD the light
    step_scale: float,
    shadow_map=None,  # (Sm, Sm) light-view clip depth, or None
    shadow_vp=None,   # (4, 4)
    shadow_bias: float = 0.0027,
    sub_ids=None,     # (C,) volume indices being refreshed (None = all N)
    sout_cache=None,  # (N, L, L) cached outgoing lateral transmittance
    return_sout: bool = False,
    impl: str = "pallas",  # "pallas": one kernel invocation per volume
                           # for each L-step march; "xla": the lax.scan
                           # twin (goldens/tests)
    shadow_quads=None,  # (4*(Sm/2)^2, 4) mesh.build_shadow_quads table
                        # (state.mesh_shadow_quads): quad-row shadow
                        # sampling instead of 4 element gathers
    static_axis=None,   # int: sweep-axis known at TRACE time (the light
                        # direction is a host-side setting; the engine
                        # derives argmax |dir| and bakes it into config)
                        # — skips the 3-branch lax.switch, whose operand
                        # /result copies traced ~0.3 ms/frame at n=64
                        # and which triples the compiled light code
):
    """Per-volume transmittance fields toward the light, with inter-volume
    occlusion chained through a shared lateral map.

    Returns (C, L, L, L) transmittance (light -> voxel), the continuous
    counterpart of the product of `CastLightRay` transmittances over all
    volumes (plus the updated (N, L, L) outgoing cache if return_sout).
    Directional-light rays are parallel, so the shared lateral map is
    anchored on the w=0 reference plane: reads/writes shift by
    slope * face-depth, making inter-volume shadow placement exact up to
    resampling.

    Temporal amortization (the reference refreshes ONE volume's light map
    per frame, `MultiRayCaster::RayMarchL` round-robin): pass sub_ids for
    the cohort being refreshed this frame plus the cached outgoing
    footprints `sout_cache` of every volume. A volume's outgoing lateral
    transmittance depends only on its density, the light direction and
    its scale — NOT its position (positions enter via the chain's
    projection, evaluated fresh each call) — so cached footprints stay
    exact under volume animation; only light-direction or density changes
    invalidate them (the engine refreshes the cache on those setters).
    """
    n = per_object.world.shape[0]
    c, l = rho_light.shape[0], rho_light.shape[1]
    g = 2 * l  # global lateral occlusion map resolution
    sub = sub_ids if sub_ids is not None else jnp.arange(n, dtype=jnp.int32)
    assert sub_ids is not None or c == n, \
        "full refresh needs rho_light for every volume"

    # Local light direction. PRECONDITION: volume worlds are uniform
    # scale + translate (world[0,0] read as THE scale below) — validated
    # at the engine API boundary (`engine._check_worlds`); rotated or
    # anisotropic volumes must use light_mode="reference".
    wi = per_object.world_i
    lx = (light_dir_world[0] * wi[:, 0, 0] + light_dir_world[1] * wi[:, 1, 0]
          + light_dir_world[2] * wi[:, 2, 0])
    ly = (light_dir_world[0] * wi[:, 0, 1] + light_dir_world[1] * wi[:, 1, 1]
          + light_dir_world[2] * wi[:, 2, 1])
    lz = (light_dir_world[0] * wi[:, 0, 2] + light_dir_world[1] * wi[:, 1, 2]
          + light_dir_world[2] * wi[:, 2, 2])
    norm = jax.lax.rsqrt(jnp.maximum(lx * lx + ly * ly + lz * lz, 1e-20))
    lx, ly, lz = lx * norm, ly * norm, lz * norm

    ax, ay, az = jnp.abs(lx[0]), jnp.abs(ly[0]), jnp.abs(lz[0])
    axis = jnp.where((az >= ax) & (az >= ay), 2, jnp.where(ay >= ax, 1, 0))

    centers = per_object.world[:, 3, :3]
    scales = per_object.world[:, 0, 0]  # uniform scale per volume
    proj = (centers[:, 0] * light_dir_world[0]
            + centers[:, 1] * light_dir_world[1]
            + centers[:, 2] * light_dir_world[2])
    order = jnp.argsort(-proj)  # closest to the light first

    def sweep_all(axis_idx):
        # orient: sweep axis leading as dim 1, lateral (v, u) = dims 2, 3
        if axis_idx == 0:     # sweep x; lateral (v=y, u=z)
            rho_a = jnp.transpose(rho_light, (0, 3, 2, 1))  # (N, x, y, z)
            lu, lv, lw = lz, ly, lx
            cu, cv = centers[:, 2], centers[:, 1]
        elif axis_idx == 1:   # sweep y; lateral (v=z, u=x)
            rho_a = jnp.transpose(rho_light, (0, 2, 1, 3))  # (N, y, z, x)
            lu, lv, lw = lx, lz, ly
            cu, cv = centers[:, 0], centers[:, 2]
        else:                 # sweep z; lateral (v=y, u=x)
            rho_a = rho_light
            lu, lv, lw = lx, ly, lz
            cu, cv = centers[:, 0], centers[:, 1]

        # propagation direction d = -light_dir; orient grids so d_w > 0
        dwc = -lw
        flip = dwc < 0.0
        flip_s = flip[sub]
        rho_o = jnp.where(flip_s[:, None, None, None],
                          jnp.flip(rho_a, axis=1), rho_a)
        dw_abs = jnp.maximum(jnp.abs(dwc), 1e-6)
        du = (-lu) / dw_abs   # voxels of lateral motion per slice
        dv = (-lv) / dw_abs
        dt_local = (2.0 / l) / dw_abs         # local arclength per slice
        # arclength in the reference's units: local * world scale relative
        # to the unit-cube march (reference marches in local units too)
        f_corr = dt_local / step_scale        # (N,)

        # Reference-plane anchoring: ray x(w) = x_ref + slope*w with
        # slope = d_lat/d_w (parallel rays). Reads happen at the entry
        # face's depth, writes at the exit face's.
        if axis_idx == 0:
            cw_axis = centers[:, 0]
        elif axis_idx == 1:
            cw_axis = centers[:, 1]
        else:
            cw_axis = centers[:, 2]
        dw_world = -lw  # world propagation component along the sweep axis
        dw_safe = jnp.where(jnp.abs(dw_world) > 1e-6, dw_world,
                            jnp.where(dw_world >= 0, 1e-6, -1e-6))
        slope_u = (-lu) / dw_safe   # lateral world units per world w unit
        slope_v = (-lv) / dw_safe
        sgn = jnp.sign(dw_safe)
        w_in = cw_axis - sgn * scales    # face where the light enters
        w_out = cw_axis + sgn * scales

        # shadow-map depth per ray, sampled once on the global lateral
        # grid: the light view is orthographic, so a ray's shadow UV is
        # constant along the ray — 4-tap bilinear over (G, G) rays
        # replaces the reference's per-voxel ShadowTest (N*L^3 gathers)
        has_sm = shadow_map is not None

        # global lateral window covering all shifted volume footprints
        cu_ref_in = cu - slope_u * w_in
        cv_ref_in = cv - slope_v * w_in
        cu_ref_out = cu - slope_u * w_out
        cv_ref_out = cv - slope_v * w_out
        lo_u = jnp.minimum(jnp.min(cu_ref_in - scales),
                           jnp.min(cu_ref_out - scales))
        hi_u = jnp.maximum(jnp.max(cu_ref_in + scales),
                           jnp.max(cu_ref_out + scales))
        lo_v = jnp.minimum(jnp.min(cv_ref_in - scales),
                           jnp.min(cv_ref_out - scales))
        hi_v = jnp.maximum(jnp.max(cv_ref_in + scales),
                           jnp.max(cv_ref_out + scales))
        span_u = jnp.maximum(hi_u - lo_u, 1e-3)
        span_v = jnp.maximum(hi_v - lo_v, 1e-3)

        if has_sm:
            gi = (jax.lax.broadcasted_iota(jnp.float32, (g, g), 1) + 0.5) / g
            gj = (jax.lax.broadcasted_iota(jnp.float32, (g, g), 0) + 0.5) / g
            u_w = lo_u + gi * span_u
            v_w = lo_v + gj * span_v
            zero = jnp.zeros_like(u_w)
            if axis_idx == 0:      # lateral (v=y, u=z), reference plane x=0
                p0 = (zero, v_w, u_w)
            elif axis_idx == 1:    # lateral (v=z, u=x), plane y=0
                p0 = (u_w, zero, v_w)
            else:                  # lateral (v=y, u=x), plane z=0
                p0 = (u_w, v_w, zero)
            m = shadow_vp
            su_ = p0[0] * m[0, 0] + p0[1] * m[1, 0] + p0[2] * m[2, 0] + m[3, 0]
            sv_ = p0[0] * m[0, 1] + p0[1] * m[1, 1] + p0[2] * m[2, 1] + m[3, 1]
            z0g = p0[0] * m[0, 2] + p0[1] * m[1, 2] + p0[2] * m[2, 2] + m[3, 2]
            uu = su_ * 0.5 + 0.5
            vv = 1.0 - (sv_ * 0.5 + 0.5)
            hs, ws = shadow_map.shape
            xs_ = uu * ws - 0.5
            ys_ = vv * hs - 0.5
            x0f, y0f = jnp.floor(xs_), jnp.floor(ys_)

            def cidx(vvv, nn):
                return jnp.clip(vvv.astype(jnp.int32), 0, nn - 1)

            have_quads = (shadow_quads is not None
                          and hs % 2 == 0 and ws % 2 == 0
                          and shadow_quads.shape[0]
                          == 4 * (hs // 2) * (ws // 2))
            if have_quads:
                # ONE parity-selected quad-row gather for all four
                # bilinear corners (mesh._shadow_map_compare's table,
                # cached in state): the per-corner element gathers were
                # 4 x 0.376 ms/frame at G=192 on v5e (traced) — element
                # gathers run ~65 Mtaps/s, packed rows ~5.6 ms/M rows
                hh, ww2 = hs // 2, ws // 2
                x0 = cidx(x0f, ws - 1)
                y0 = cidx(y0f, hs - 1)
                fx = jnp.clip(xs_ - x0.astype(jnp.float32), 0.0, 1.0)
                fy = jnp.clip(ys_ - y0.astype(jnp.float32), 0.0, 1.0)
                base = (((y0 & 1) * 2 + (x0 & 1)) * (hh * ww2))
                quad = shadow_quads[base + (y0 >> 1) * ww2 + (x0 >> 1)]
                sm0 = quad[..., 0] * (1 - fx) + quad[..., 1] * fx
                sm1 = quad[..., 2] * (1 - fx) + quad[..., 3] * fx
            else:
                fx, fy = xs_ - x0f, ys_ - y0f
                xa, xb = cidx(x0f, ws), cidx(x0f + 1, ws)
                ya, yb = cidx(y0f, hs), cidx(y0f + 1, hs)
                sm0 = (shadow_map[ya, xa] * (1 - fx)
                       + shadow_map[ya, xb] * fx)
                sm1 = (shadow_map[yb, xa] * (1 - fx)
                       + shadow_map[yb, xb] * fx)
            sm_g = sm0 * (1 - fy) + sm1 * fy + shadow_bias   # (G, G)
            # light-space z advance per unit world w along a ray
            dirx, diry, dirz = (-light_dir_world[0], -light_dir_world[1],
                                -light_dir_world[2])
            dz_dp = dirx * m[0, 2] + diry * m[1, 2] + dirz * m[2, 2]
            dir_w = (dirx, diry, dirz)[axis_idx]
            dzdw = dz_dp / jnp.where(jnp.abs(dir_w) > 1e-6, dir_w,
                                     jnp.where(dir_w >= 0, 1e-6, -1e-6))
        else:
            sm_g = z0g = dzdw = None

        # ---- batched restructure: T_k = advect_k(t_in) * S_k ----------
        # The per-voxel recurrence T <- shift(T) * atten factors into a
        # volume-only self term S (t_in = 1) and the advected incoming
        # occlusion, because the lateral shift is (near-)linear: the two
        # batched L-step scans below run only for the refreshed cohort;
        # the global-map chain is a batched outgoing-footprint einsum +
        # an exclusive cumulative product in light order (the sequential
        # per-volume walk expressed as one vectorized cumprod — identical
        # math, N-way parallel). Deviation: the factorization commutes
        # interpolation with the product (interp(a*b) ~
        # interp(a)*interp(b)) — sub-texel smoothing-level differences,
        # covered by the lightsweep tolerance tests.
        mu_sub = jax.vmap(lambda sh: _interp_matrix_shift(l, sh))(du[sub])
        mv_sub = jax.vmap(lambda sh: _interp_matrix_shift(l, sh))(dv[sub])

        # per-volume entry/exit resample weights (pure geometry)
        su = (2.0 * scales / l) * (g / span_u)
        ou = ((cu_ref_in - scales - lo_u) / span_u) * g - 0.5 + 0.5 * su
        sv = (2.0 * scales / l) * (g / span_v)
        ov = ((cv_ref_in - scales - lo_v) / span_v) * g - 0.5 + 0.5 * sv
        mu_in = jax.vmap(lambda a, b: _resample_matrix(l, g, a, b))(
            su[sub], ou[sub])                                # (C, L, G)
        mv_in = jax.vmap(lambda a, b: _resample_matrix(l, g, a, b))(
            sv[sub], ov[sub])

        ou_o = ((cu_ref_out - scales - lo_u) / span_u) * g - 0.5 + 0.5 * su
        ov_o = ((cv_ref_out - scales - lo_v) / span_v) * g - 0.5 + 0.5 * sv
        gu_rows = jax.lax.broadcasted_iota(jnp.float32, (g, l), 0)
        gu_cols = jax.lax.broadcasted_iota(jnp.float32, (g, l), 1)
        wu_all = jnp.maximum(
            1.0 - jnp.abs((gu_rows - ou_o[:, None, None])
                          / su[:, None, None] - gu_cols), 0.0)
        wv_all = jnp.maximum(
            1.0 - jnp.abs((gu_rows - ov_o[:, None, None])
                          / sv[:, None, None] - gu_cols), 0.0)

        if has_sm:
            sm_vol = jnp.einsum("cvg,gh,cuh->cvu", mv_in, sm_g, mu_in)
            z_vol = jnp.einsum("cvg,gh,cuh->cvu", mv_in, z0g, mu_in)
            z_entry = z_vol + (dzdw * w_in)[sub][:, None, None]
            dz_slice = (dzdw * sgn * (2.0 * scales / l))[sub]  # (C,)
            soft = jnp.maximum(jnp.abs(dz_slice), 1e-6)
        else:
            sm_vol = z_entry = None

        f_corr_s = f_corr[sub]
        ones_c = jnp.ones((c, l, l), jnp.float32)

        def bshift(x):
            return jnp.einsum("nab,nbc,ndc->nad", mv_sub, x, mu_sub)

        # Self-sweep: volume-only transmittance + per-slice mesh factor.
        # Production runs the L-step march in ONE Pallas invocation per
        # volume (the XLA scan's 2 tiny (L, L) matmuls per step are
        # launch-bound — see ops/pallas/lightsweep_kernel.py); the scan
        # below is the semantics twin (impl="xla").
        if impl == "pallas":
            from multivolumes_tpu.ops.pallas import lightsweep_kernel

            here_wm, s_out_c = lightsweep_kernel.light_self_scan_pallas(
                rho_o, mv_sub, mu_sub,
                sm_vol if has_sm else ones_c,
                z_entry if has_sm else ones_c,
                f_corr_s,
                dz_slice if has_sm else jnp.zeros_like(f_corr_s),
                soft if has_sm else jnp.ones_like(f_corr_s),
                has_sm=has_sm,
            )                                # here_wm (C, L, L, L)
            self_here = None
        else:
            rho_steps = jnp.moveaxis(rho_o, 1, 0)            # (L, C, L, L)

            def self_body(carry, inp):
                s_c, sm_c, z_c = carry
                rho_k, kf = inp
                shifted = bshift(s_c)
                if has_sm:
                    sm_c = bshift(sm_c)
                    z_c = bshift(z_c)
                    zk = z_c + ((kf + 0.5) * dz_slice)[:, None, None]
                    lit = jnp.clip((sm_c - zk) / soft[:, None, None] + 1.0,
                                   0.0, 1.0)
                    here = shifted * lit
                else:
                    here = shifted
                atten = jnp.exp2(
                    f_corr_s[:, None, None]
                    * jnp.log2(jnp.maximum(1.0 - rho_k * ABSORPTION, 1e-7)))
                return (shifted * atten, sm_c, z_c), here

            ks = jnp.arange(l, dtype=jnp.float32)
            (s_out_c, _sm, _z), self_here = jax.lax.scan(
                self_body,
                (ones_c,
                 sm_vol if has_sm else ones_c,
                 z_entry if has_sm else ones_c),
                (rho_steps, ks))                             # (L, C, L, L)
            here_wm = None

        # outgoing footprint cache: refreshed cohort entries replace the
        # cached ones; every volume's footprint feeds the chain below
        if sout_cache is not None:
            s_out_all = sout_cache.at[sub].set(s_out_c)       # (N, L, L)
        else:
            s_out_all = s_out_c

        # global-map chain (light order): each cohort volume needs the
        # product of the occlusion factors of every volume AHEAD of it
        o_big = jnp.einsum("ngl,nlk,nhk->ngh",
                           wv_all, s_out_all, wu_all)         # (N, G, G)
        cover = jnp.clip(wv_all.sum(2)[:, :, None]
                         * wu_all.sum(2)[:, None, :], 0.0, 1.0)
        fac = o_big + (1.0 - cover)
        ranks = jnp.argsort(order)                # volume -> light rank
        if sub.shape[0] * 4 <= n:
            # small cohort: ONE masked product per cohort volume beats
            # materializing all N exclusive prefixes (the cumprod's
            # associative scan was ~1.5 ms/frame of small concats at
            # n=64, traced; only `c` of its rows were ever read)
            mask = ranks[None, :] < ranks[sub][:, None]       # (C, N)
            g_in = jnp.prod(
                jnp.where(mask[:, :, None, None], fac[None], 1.0),
                axis=1)                                       # (C, G, G)
        else:
            cum = jnp.cumprod(fac[order], axis=0)
            g_excl = jnp.concatenate(
                [jnp.ones_like(cum[:1]), cum[:-1]], 0)
            g_in = g_excl[ranks[sub]]                         # (C, G, G)
        t_ins = jnp.einsum("cvg,cgh,cuh->cvu", mv_in, g_in, mu_in)

        # advect the incoming occlusion through the volumes (batched)
        if impl == "pallas":
            from multivolumes_tpu.ops.pallas import lightsweep_kernel

            t_fields = lightsweep_kernel.light_advect_mul_pallas(
                here_wm, t_ins, mv_sub, mu_sub)               # (C, L, L, L)
        else:
            def adv_body(t_c, _):
                t_c = bshift(t_c)
                return t_c, t_c

            _t, t_adv = jax.lax.scan(adv_body, t_ins, None, length=l)
            t_fields = jnp.moveaxis(self_here * t_adv, 0, 1)  # (C, L, L, L)
        t_fields = jnp.where(flip_s[:, None, None, None],
                             jnp.flip(t_fields, axis=1), t_fields)

        if axis_idx == 0:
            t_fields = jnp.transpose(t_fields, (0, 3, 2, 1))
        elif axis_idx == 1:
            t_fields = jnp.transpose(t_fields, (0, 2, 1, 3))
        return t_fields, s_out_all

    if static_axis is not None:
        t_fields, s_out_all = sweep_all(int(static_axis))
    else:
        t_fields, s_out_all = jax.lax.switch(
            axis, [lambda: sweep_all(0), lambda: sweep_all(1),
                   lambda: sweep_all(2)])
    if return_sout:
        return t_fields, s_out_all
    return t_fields


def precompute_static(volumes, light_grid_size: int,
                      max_light_samples: int, ao_taps: int = 8):
    """Static per-source lighting fields (density-only functions, computed
    once at scene build / volume upload, NOT per frame):

    - rho_light: (N_src, L, L, L) density resampled to the light grid
    - ao: (N_src, L, L, L) transmittance along the negated density
      gradient (short fixed-tap march — the self-volume part of
      `CSRayMarchL.hlsl:99-108`)
    - grad_dir: (N_src, 3, L, L, L) unit AO ray directions (channel-mid)
    """
    l = light_grid_size
    n_src = volumes.shape[0]
    step_scale = MAX_DIST / float(max_light_samples)

    rho_light = densities_at_light_grid(volumes, l)

    ts = (jnp.arange(l, dtype=jnp.float32) + 0.5) / l * 2.0 - 1.0
    vz, vy, vx = jnp.meshgrid(ts, ts, ts, indexing="ij")
    shape = (n_src, l, l, l)
    tex_idx = jnp.broadcast_to(
        jnp.arange(n_src, dtype=jnp.int32)[:, None, None, None], shape
    )
    u = jnp.broadcast_to((vx * 0.5 + 0.5)[None], shape)
    v = jnp.broadcast_to((vy * 0.5 + 0.5)[None], shape)
    w = jnp.broadcast_to((vz * 0.5 + 0.5)[None], shape)

    def dens(du_, dv_, dw_):
        return indexed_trilinear_soa(volumes, tex_idx, u + du_, v + dv_, w + dw_)[3]

    eps = 1.0 / l
    gx = dens(eps, 0, 0) - dens(-eps, 0, 0)
    gy = dens(0, eps, 0) - dens(0, -eps, 0)
    gz = dens(0, 0, eps) - dens(0, 0, -eps)
    zero_g = (jnp.abs(gx) + jnp.abs(gy) + jnp.abs(gz)) <= 0.0
    ax_ = jnp.where(zero_g, vx[None], -gx)
    ay_ = jnp.where(zero_g, vy[None], -gy)
    az_ = jnp.where(zero_g, vz[None], -gz)
    ginv = jax.lax.rsqrt(jnp.maximum(ax_ * ax_ + ay_ * ay_ + az_ * az_, 1e-20))
    ax_, ay_, az_ = ax_ * ginv, ay_ * ginv, az_ * ginv

    ao_step = 1.0 / ao_taps  # uvw step; covers half the box
    transm = jnp.ones(shape, jnp.float32)
    for k in range(1, ao_taps + 1):
        s = k * ao_step * 0.5
        dk = dens(ax_ * s, ay_ * s, az_ * s)
        f = (ao_step * 0.5 * MAX_DIST) / step_scale
        transm = transm * jnp.exp2(
            f * jnp.log2(jnp.maximum(1.0 - dk * ABSORPTION, 1e-7))
        )

    grad_dir = jnp.stack([ax_, ay_, az_], axis=1)  # (N_src, 3, L, L, L)
    return rho_light, transm, grad_dir


def _shade_light_fields(shadow, rho, tex_sub, ao_src, grad_dir_src,
                        sh_coeffs, ambient, light_color,
                        has_light_probe: bool):
    """Transmittance fields -> RGB light maps (C, 3, L, L, L)."""
    has_density = rho >= ZERO_THRESHOLD
    if has_light_probe:
        ao = ao_src[tex_sub]
        gd = grad_dir_src[tex_sub]                     # (C, 3, L, L, L)
        # rotation-free worlds: local gradient dir == world dir
        nrm = jnp.moveaxis(gd, 1, -1)
        irr = sh_lib.eval_irradiance(sh_coeffs, nrm)   # (C, L, L, L, 3)
        amb_r = jnp.where(has_density, ao * irr[..., 0], 0.0)
        amb_g = jnp.where(has_density, ao * irr[..., 1], 0.0)
        amb_b = jnp.where(has_density, ao * irr[..., 2], 0.0)
    else:
        amb = ambient[:3] * ambient[3]
        amb_r = jnp.full_like(shadow, amb[0])
        amb_g = jnp.full_like(shadow, amb[1])
        amb_b = jnp.full_like(shadow, amb[2])

    lcol = light_color[:3] * light_color[3]
    return jnp.stack(
        [shadow * lcol[0] + amb_r, shadow * lcol[1] + amb_g,
         shadow * lcol[2] + amb_b],
        axis=1,
    )


def ray_march_light_sweep_update(
    rho_light_src,    # (N_src, L, L, L) from precompute_static
    ao_src,           # (N_src, L, L, L)
    grad_dir_src,     # (N_src, 3, L, L, L)
    vol_tex_ids, per_object: PerObject,
    shadow_map, shadow_vp, light_pos, light_color, ambient, sh_coeffs,
    max_light_samples: int, has_light_probe: bool = True,
    sub_ids=None,     # (C,) volume indices refreshed this frame
    sout_cache=None,  # (N, L, L)
    impl: str = "pallas",
    shadow_quads=None,  # cached quad-packed shadow table (see
                        # light_transmittance)
    static_axis=None,   # see light_transmittance
):
    """Refresh the light maps of a volume cohort (the reference's
    temporal amortization, `MultiRayCaster::RayMarchL` one volume per
    frame round-robin — here C per frame with exact inter-volume
    occlusion from the cached outgoing footprints).

    Returns (maps (C, 3, L, L, L), sout (N, L, L)); the caller scatters
    both into state. Staleness semantics match the reference: non-cohort
    maps keep last refresh's lighting."""
    step_scale = MAX_DIST / float(max_light_samples)
    tex_sub = (vol_tex_ids if sub_ids is None
               else vol_tex_ids[sub_ids]).astype(jnp.int32)
    rho = rho_light_src[tex_sub]                       # (C, L, L, L)

    light_dir = light_pos[:3] / jnp.linalg.norm(light_pos[:3])
    # the mesh's shadow map rides the same shear-warp sweep (a per-slice
    # depth compare) instead of N*L^3 per-voxel ShadowTest gathers
    shadow, sout = light_transmittance(
        rho, per_object, light_dir, step_scale,
        shadow_map=shadow_map, shadow_vp=shadow_vp,
        sub_ids=sub_ids, sout_cache=sout_cache, return_sout=True,
        impl=impl, shadow_quads=shadow_quads, static_axis=static_axis)

    maps = _shade_light_fields(shadow, rho, tex_sub, ao_src, grad_dir_src,
                               sh_coeffs, ambient, light_color,
                               has_light_probe)
    return maps, sout


def ray_march_light_sweep(
    rho_light_src,    # (N_src, L, L, L) from precompute_static
    ao_src,           # (N_src, L, L, L)
    grad_dir_src,     # (N_src, 3, L, L, L)
    vol_tex_ids, per_object: PerObject, cull: CullResult,
    shadow_map, shadow_vp, light_pos, light_color, ambient, sh_coeffs,
    max_light_samples: int, has_light_probe: bool = True,
):
    """All N light maps in one pass: -> (N, 3, L, L, L) channel-mid.

    Same output contract as `lightmarch.ray_march_light` with every
    volume refreshed (the full-refresh case of
    `ray_march_light_sweep_update`; the per-frame graph amortizes over
    cohorts instead). All density-derived fields come precomputed (zero
    per-frame gathers)."""
    del cull  # visibility never gates light maps (shadows of off-screen
    #           volumes still land on visible ones)
    maps, _sout = ray_march_light_sweep_update(
        rho_light_src, ao_src, grad_dir_src, vol_tex_ids, per_object,
        shadow_map, shadow_vp, light_pos, light_color, ambient, sh_coeffs,
        max_light_samples, has_light_probe=has_light_probe,
    )
    return maps
