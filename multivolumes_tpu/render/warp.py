"""MXU warp composite: cube-map resampling as separable projective warps.

Replaces the per-pixel cube-map *gathers* of `composite.composite_oit`
(the reference's `PSCube.hlsl` + `PSResolveOIT.hlsl` path) with pure
matmul work. The observation: for one volume and one cube-map exit face,
the map from screen NDC ``q = [x, y, 1]`` to face coordinates is a
homography —

* the local-space ray direction is *linear* in ``q``: ``d_local = q @ B``
  (the unprojected point is homogeneous-linear in screen coords, and the
  un-normalised direction ``P_h.xyz - eye * P_h.w`` keeps that linearity);
* the ray-box exit coordinate on face ``(axis a, sign s)`` is
  ``e_b = (o_b * d_a + (s - o_a) * d_b) / d_a`` — a ratio of two linear
  forms of ``q``;
* each face's ``(u, v)`` is affine in two exit components
  (`GetLocalPos`, `CSRayMarch.hlsl:28-53`).

So ``u = (nu . q)/(den . q)`` and ``v = (nv . q)/(den . q)``: bilinear
cube sampling over a screen tile is a projective image warp. A projective
warp decomposes (Catmull-Smith) into two 1-D resamples, and each 1-D
resample with a 2-tap tent kernel is an interpolation-*matrix* product —
measured at ~55 Gtaps/s on the v5e MXU vs ~65 Mtaps/s for the equivalent
HBM gathers (docs/ROADMAP.md). Zero gathers on the hot path.

Per volume, all work is confined to a static screen tile around the
volume's projected centre (`dynamic_slice` placement), so cost scales
with footprint, not screen x volume count. The per-pixel exit-face
select, validity and the streaming nearest-K OIT insertion (see
composite.py) run on the tile only.

Documented deviations from the gather path (tested within tolerance by
tests/test_warp.py):

* the two-pass tent resample is the projectively-correct filter; it
  differs from point-bilinear by sub-texel amounts under perspective;
* `CubeCast`'s depth-aware tap weights (`PSCube.hlsli:51-108`) reduce to
  plain bilinear whenever the four taps agree — the warp path always
  behaves like that uniform case (mesh intersections lose the per-tap
  seam softening; hard `exit_z <= scene_z` occlusion is kept);
* `GetDomain`'s exterior-edge snap becomes clamp-to-edge;
* a volume's footprint is clipped to its tile (tile size auto-scales
  with volume count in `frame.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multivolumes_tpu.core import math3d
from multivolumes_tpu.render import raymarch
from multivolumes_tpu.render.composite import (
    FLT_MAX,
    _ray_box_exit_soa,
    _underblend,
    dir_to_face_uv_soa,
)
from multivolumes_tpu.render.cull import CullResult
from multivolumes_tpu.render.perframe import PerObject

# Face table matching `dir_to_face_uv_soa` / `GetLocalPos`
# (`CSRayMarch.hlsl:28-53`): face -> (axis, sign, (u axis, u coeff),
# (v axis, v coeff)); u = 0.5 + cu * e[bu], v = 0.5 + cv * e[bv].
_FACES = (
    (0, +1.0, (2, -0.5), (1, -0.5)),   # +X
    (0, -1.0, (2, +0.5), (1, -0.5)),   # -X
    (1, +1.0, (0, +0.5), (2, +0.5)),   # +Y
    (1, -1.0, (0, +0.5), (2, -0.5)),   # -Y
    (2, +1.0, (0, +0.5), (1, -0.5)),   # +Z
    (2, -1.0, (0, -0.5), (1, -0.5)),   # -Z
)

_EPS = 1e-12

# Number of volumes promoted to the "big footprint" tile class (whose
# tile spans the whole screen — near volumes never clip).
_NUM_BIG = 12


def screen_basis(screen_to_world, eye):
    """(3, 3) matrix A with ``d_world = [x_ndc, y_ndc, 1] @ A``.

    Same unprojection as `composite.screen_rays` (mid-depth point,
    z = 0.5), but kept homogeneous: the direction to the unprojected
    point is ``P_h.xyz - eye * P_h.w`` up to a positive scale, which is
    linear in the screen coordinates.
    """
    m = screen_to_world
    rows = [m[0], m[1], 0.5 * m[2] + m[3]]
    return jnp.stack([r[:3] - eye * r[3] for r in rows])


def face_homography(b_mat, o, face: int):
    """Homography coefficient 3-vectors (nu, nv, den) for one exit face:
    ``u = (nu.q)/(den.q)``, ``v = (nv.q)/(den.q)`` with u, v in [0, 1].

    b_mat: (3, 3) with d_local = q @ b_mat; o: (3,) local eye.
    """
    a, s, (bu, cu), (bv, cv) = _FACES[face]
    den = b_mat[:, a]

    def exit_num(comp):
        # e_comp numerator: o_comp * d_a + (s - o_a) * d_comp
        return o[comp] * den + (s - o[a]) * b_mat[:, comp]

    nu = 0.5 * den + cu * exit_num(bu)
    nv = 0.5 * den + cv * exit_num(bv)
    return nu, nv, den


def catmull_swap_flags(a_mat, world_i, world_view_proj, eye_local, n_eff):
    """Per-(volume, face) Catmull-Smith resample-axis choice for the
    tile composite: True = sample rows along the face's u axis (the
    face image is consumed TRANSPOSED).

    The decision picks whichever face axis varies more with screen y at
    the volume's projected centre (`tilecast._tile_prep`'s criterion).
    Shared between the tile prep (which builds the kernel's homography
    rows with it) and the sweep's bucket assembly (which can emit the
    face images pre-swapped so the prep never re-materializes the
    (N, 6, 4, S, S) stack — `sweep.ray_march_view_sweep_lod
    swap_basis`). Both sides MUST compute identical flags, hence one
    function; the expressions match `_tile_prep` exactly.

    a_mat: (3, 3) `screen_basis`; world_i/world_view_proj: (N, 4, 4);
    eye_local: (N, 3); n_eff: (N,) f32. Returns (N, 6) bool.
    """
    wi3 = world_i[:, :3, :3]
    b_mat = jnp.einsum("ij,njk->nik", a_mat, wi3)             # (N, 3, 3)
    c0 = world_view_proj[:, 3, :]
    c0w = jnp.where(jnp.abs(c0[:, 3]) > 1e-3, c0[:, 3], 1e-3)
    xc = jnp.clip(c0[:, 0] / c0w, -1.0, 1.0)                  # (N,)
    yc = jnp.clip(c0[:, 1] / c0w, -1.0, 1.0)
    swaps = []
    for f in range(6):
        nu, nv, den = jax.vmap(
            lambda b, o, f=f: face_homography(b, o, f)
        )(b_mat, eye_local)                                   # (N, 3) each
        p_u = n_eff[:, None] * nu - 0.5 * den
        p_v = n_eff[:, None] * nv - 0.5 * den
        dqc = den[:, 0] * xc + den[:, 1] * yc + den[:, 2]
        vqc = p_v[:, 0] * xc + p_v[:, 1] * yc + p_v[:, 2]
        uqc = p_u[:, 0] * xc + p_u[:, 1] * yc + p_u[:, 2]
        dv_dy = p_v[:, 1] * dqc - den[:, 1] * vqc
        du_dy = p_u[:, 1] * dqc - den[:, 1] * uqc
        swaps.append(jnp.abs(dv_dy) < jnp.abs(du_dy))
    return jnp.stack(swaps, axis=1)                           # (N, 6)


def _safe(x, eps=_EPS):
    return jnp.where(jnp.abs(x) > eps, x, jnp.where(x >= 0, eps, -eps))


def _tent(pos, n: int, dtype):
    """2-tap tent interpolation rows: (..., n) with max(0, 1 - |i - pos|).

    For pos clipped to [0, n-1] the rows sum to 1 and reproduce linear
    interpolation with clamp-to-edge.
    """
    i = jnp.arange(n, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(i - pos[..., None]))
    return w.astype(dtype)


def warp_face(img, p_u, p_v, den, xg, yg, hi=None):
    """Two-pass separable projective warp of one face image to a tile.

    img: (C, S, S) indexed [v, u], already sliced to the volume's
    effective mip extent (S == n_eff, static per footprint class — the
    tent matrices scale with S, which is most of this pass's HBM
    traffic); p_u/p_v/den: homography 3-vectors in *texel* space
    (u_texel = (p_u.q)/(den.q), already n_eff-scaled); xg (Wt,), yg (Ht,)
    tile NDC coords.
    Returns (C, Ht, Wt) = img[v(y,x), u(y,x)] with clamp-to-edge.
    """
    s = img.shape[-1]
    dt = img.dtype
    if hi is None:
        hi = s - 1.0   # static class extent; traced for per-volume n_eff

    # Pass 1: for each face row r, resample img[:, r, :] along u at the
    # screen-x positions where v(x, y) == r. Solve (p_v - r*den).q = 0
    # for y given x (Catmull-Smith auxiliary).
    r = jnp.arange(s, dtype=jnp.float32)
    k0 = p_v[0] - r * den[0]               # (S,)
    k1 = p_v[1] - r * den[1]
    k2 = p_v[2] - r * den[2]
    y1 = -(k0[:, None] * xg[None, :] + k2[:, None]) / _safe(k1)[:, None]
    dq1 = den[0] * xg[None, :] + den[1] * y1 + den[2]
    ut = (p_u[0] * xg[None, :] + p_u[1] * y1 + p_u[2]) / _safe(dq1)
    ut = jnp.clip(jnp.nan_to_num(ut, nan=0.0, posinf=0.0, neginf=0.0),
                  0.0, hi)
    w1 = _tent(ut, s, dt)                  # (S, Wt, S_u)
    tmp = jnp.einsum("cvu,vxu->cvx", img, w1,
                     preferred_element_type=jnp.float32).astype(dt)

    # Pass 2: per pixel, interpolate along the face rows at v(y, x).
    #
    # Two formulations, chosen per face by lax.cond:
    #
    # * Piecewise-rectified (fast): the naive contraction
    #   sum_v tmp[c,v,x] * tent(vt(y,x) - v) has per-(y,x) weights — a
    #   batched-thin matmul XLA runs ~10x below MXU rates. Per x-chunk,
    #   resample rows at TWO chunk-end anchor maps vt(y, x_end) — weights
    #   shared across the chunk, fat matmuls — plus the first-order
    #   correction delta * d/dv (exact while vt stays within one texel
    #   cell of its anchor; the interpolant is piecewise linear). Each
    #   pixel picks the anchor on its side of the homography pole
    #   (sign(dq)) with the nearer vt.
    # * Dense (exact): the per-pixel tent contraction, kept for faces
    #   whose v-coordinate sweeps more than ~a texel per pixel across a
    #   chunk (edge-on sliver faces, strongly rotated footprints) where
    #   the rectified expansion breaks down.
    dq = den[0] * xg[None, :] + den[1] * yg[:, None] + den[2]
    vt = (p_v[0] * xg[None, :] + p_v[1] * yg[:, None] + p_v[2]) / _safe(dq)
    vt = jnp.clip(jnp.nan_to_num(vt, nan=0.0, posinf=0.0, neginf=0.0),
                  0.0, hi)

    wt = xg.shape[0]
    ht_n = yg.shape[0]
    chunk = 16
    while wt % chunk:
        chunk //= 2
    n_ch = wt // chunk

    def dense_pass2():
        w2 = _tent(vt, s, dt)              # (Ht, Wt, S_v)
        return jnp.einsum("cvx,yxv->cyx", tmp, w2,
                          preferred_element_type=jnp.float32)

    def rectified_pass2():
        xl = xg[0::chunk]                                     # (n_ch,)
        xr = xg[(chunk - 1)::chunk]
        i = jnp.arange(s, dtype=jnp.float32)
        tmp_n = tmp.reshape(tmp.shape[0], s, n_ch, chunk)
        vt_n = vt.reshape(ht_n, n_ch, chunk)

        def rectified(xa):
            dqa = den[0] * xa[:, None] + den[1] * yg[None, :] + den[2]
            vt_c = (p_v[0] * xa[:, None] + p_v[1] * yg[None, :] + p_v[2]) \
                / _safe(dqa)
            vt_c = jnp.clip(
                jnp.nan_to_num(vt_c, nan=0.0, posinf=0.0, neginf=0.0),
                0.0, hi)                                      # (n_ch, Ht)
            w2 = _tent(vt_c, s, dt)                           # (n_ch,Ht,S_v)
            # tent-derivative rows: d/dp of linear interp = t[v0+1]-t[v0]
            v0 = jnp.clip(jnp.floor(vt_c), 0.0, s - 2.0)
            w2d = ((i == v0[..., None] + 1.0).astype(dt)
                   - (i == v0[..., None]).astype(dt))
            base = jnp.einsum("nyv,cvnx->cnyx", w2, tmp_n,
                              preferred_element_type=jnp.float32)
            slope = jnp.einsum("nyv,cvnx->cnyx", w2d, tmp_n,
                               preferred_element_type=jnp.float32)
            delta_raw = vt_n - vt_c.T[:, :, None]
            delta = jnp.clip(delta_raw, -2.0, 2.0)
            outa = base + delta[None].transpose(0, 2, 1, 3) * slope
            return outa, dqa, jnp.abs(delta_raw)

        out_l, dq_l, ad_l = rectified(xl)
        out_r, dq_r, ad_r = rectified(xr)
        dq_n = dq.reshape(ht_n, n_ch, chunk)
        same_l = (dq_n * dq_l.T[:, :, None]) > 0.0
        same_r = (dq_n * dq_r.T[:, :, None]) > 0.0
        use_l = jnp.where(same_l == same_r, ad_l <= ad_r, same_l)
        out = jnp.where(use_l[None].transpose(0, 2, 1, 3), out_l, out_r)
        return out.transpose(0, 2, 1, 3).reshape(tmp.shape[0], ht_n, wt)

    # rectified validity: |dv/dx| at the tile centre, in texels per
    # pixel, must keep the in-chunk sweep within the correction budget
    xc_ = (xg[0] + xg[-1]) * 0.5
    yc_ = (yg[0] + yg[-1]) * 0.5
    dqc = den[0] * xc_ + den[1] * yc_ + den[2]
    vqc = p_v[0] * xc_ + p_v[1] * yc_ + p_v[2]
    dv_dx = (p_v[0] * dqc - den[0] * vqc) / _safe(dqc * dqc)
    px_ndc = jnp.abs(xg[1] - xg[0]) if wt > 1 else 1.0
    sweep_per_chunk = jnp.abs(dv_dx) * px_ndc * (chunk * 0.5)
    return jax.lax.cond(sweep_per_chunk < 1.0,
                        rectified_pass2, dense_pass2)


def composite_oit_warp(
    cube_maps: raymarch.CubeMaps,   # color (N, 6, 4, S, S) UNPACKED
    per_object: PerObject,
    cull: CullResult,
    eye,
    screen_to_world,
    depth_map,                      # (H, W) scene clip depth or None
    width: int,
    height: int,
    num_layers: int,
    tile: int,
    lod_order=None,                 # (N,) volume ranking from lod_partition
    lod_buckets=None,               # [(start, count, size_b, mip_b), ...]
):
    """Full OIT composite via per-volume tile warps -> premultiplied
    (r, g, b, a) screen fields. Semantics mirror
    `composite.composite_oit(use_raycast=False)`.

    Volumes are grouped into footprint classes that mirror the sweep's
    LOD buckets (`sweep.lod_partition`): a class's cube maps have a
    *static* effective extent n_eff = size_b and its screen tile scales
    with it (cube density ~ screen density, the paper's thesis), so both
    the tent-matrix traffic and the tile area track each volume's actual
    projected size. The `_NUM_BIG` mip-0 volumes keep a full-screen tile
    (near volumes must never clip). Without LOD info, all volumes are
    full-extent: the largest-projected get the full-screen tile, the
    rest the base tile.
    """
    color = cube_maps.color
    assert color.shape[2] == 4, "warp composite needs unpacked cube maps"
    n = per_object.world.shape[0]
    s = color.shape[-1]
    num_layers = min(num_layers, n)

    a_mat = screen_basis(screen_to_world, eye)          # (3, 3)
    eye_local = math3d.transform_point3(eye, per_object.world_i)  # (N, 3)
    wi3 = per_object.world_i[:, :3, :3]                 # (N, 3, 3)
    scene_z = depth_map if depth_map is not None else jnp.ones(
        (height, width), jnp.float32
    )
    # per-volume effective map extent from the sweep's effective mips
    n_eff_all = (s >> jnp.clip(cull.mip_level, 0, 31)).astype(jnp.float32)

    # Tile anchors: centre of the projected corner bbox (the projected
    # volume centre is offset from the footprint centre under perspective,
    # which would clip one side of the tile).
    corners = jnp.asarray(
        [[x, y, z] for x in (-1.0, 1.0) for y in (-1.0, 1.0)
         for z in (-1.0, 1.0)], jnp.float32)                     # (8, 3)
    ch_ = math3d.transform_point(
        corners[None], per_object.world_view_proj[:, None])      # (N, 8, 4)
    cok = ch_[..., 3] > 1e-3                                     # (N, 8)
    chw = jnp.maximum(ch_[..., 3], 1e-3)
    px = (ch_[..., 0] / chw * 0.5 + 0.5) * width                 # (N, 8)
    py = (-ch_[..., 1] / chw * 0.5 + 0.5) * height
    big = jnp.float32(1e9)

    def _vis_bounds(p, lim):
        # on-screen extent over valid corners (an off-screen bbox half
        # must not drag the tile away from the visible pixels;
        # behind-camera corners project garbage)
        lo = jnp.clip(jnp.min(jnp.where(cok, p, big), -1), 0, lim)
        hi = jnp.clip(jnp.max(jnp.where(cok, p, -big), -1), 0, lim)
        return lo, hi

    vx_lo, vx_hi = _vis_bounds(px, width)
    vy_lo, vy_hi = _vis_bounds(py, height)
    # projected volume centre (= clip image of the local origin)
    c0 = per_object.world_view_proj[:, 3, :]
    c0w = jnp.maximum(c0[:, 3], 1e-3)
    c0x = (c0[:, 0] / c0w * 0.5 + 0.5) * width
    c0y = (-c0[:, 1] / c0w * 0.5 + 0.5) * height

    def body(carry, xs, ht, wt, n_eff):
        # layers packed (5, K, H, W): [z, r, g, b, a] — one dynamic
        # slice/update per volume instead of five (ops inside the scan's
        # while loop carry per-iteration dispatch cost)
        (vid, wi3_v, wvp, o, x0, y0, n_eff_v, visible) = xs

        def process(layers):
            # tile NDC grids
            xg = ((x0.astype(jnp.float32) + jnp.arange(wt) + 0.5)
                  / width * 2.0 - 1.0)
            yg = -((y0.astype(jnp.float32) + jnp.arange(ht) + 0.5)
                   / height * 2.0 - 1.0)

            b_mat = a_mat @ wi3_v                        # (3, 3)
            # analytic exit point on the tile (same math as the gather
            # path's exit_key, restricted to the tile)
            dlx = b_mat[0, 0] * xg[None, :] + b_mat[1, 0] * yg[:, None] + b_mat[2, 0]
            dly = b_mat[0, 1] * xg[None, :] + b_mat[1, 1] * yg[:, None] + b_mat[2, 1]
            dlz = b_mat[0, 2] * xg[None, :] + b_mat[1, 2] * yg[:, None] + b_mat[2, 2]
            ox = jnp.broadcast_to(o[0], dlx.shape)
            oy = jnp.broadcast_to(o[1], dlx.shape)
            oz = jnp.broadcast_to(o[2], dlx.shape)
            hit, t_exit = _ray_box_exit_soa(ox, oy, oz, dlx, dly, dlz)
            qx = ox + dlx * t_exit
            qy = oy + dly * t_exit
            qz = oz + dlz * t_exit
            face_id, _, _ = dir_to_face_uv_soa(qx, qy, qz)
            hx, hy, hz, hw = raymarch._transform_point_soa(qx, qy, qz, wvp)
            exit_z = hz / jnp.maximum(hw, 1e-20)
            sz = jax.lax.dynamic_slice(scene_z, (y0, x0), (ht, wt))
            valid = (hit & (hw > 0.0)
                     & (exit_z <= sz) & (exit_z > 0.0))

            # class slice is static (n_eff = bucket extent); the volume's
            # actual extent n_eff_v <= n_eff drives the homography scale
            # and the clamp (maps pack into the top-left n_eff_v^2)
            img_all = color[vid][:, :, :n_eff, :n_eff]   # (6, 4, n, n)
            rr = jnp.zeros((ht, wt), jnp.float32)
            gg = jnp.zeros_like(rr)
            bb = jnp.zeros_like(rr)
            aa = jnp.zeros_like(rr)
            for f in range(6):
                use_f = valid & (face_id == f)
                nu, nv, den = face_homography(b_mat, o, f)
                p_u = n_eff_v * nu - 0.5 * den
                p_v = n_eff_v * nv - 0.5 * den

                # Orientation: resample rows along whichever face axis
                # varies more with screen-y (avoids the Catmull-Smith
                # bottleneck when a face's v-isolines run vertically).
                xc = (xg[0] + xg[-1]) * 0.5
                yc = (yg[0] + yg[-1]) * 0.5
                dqc = den[0] * xc + den[1] * yc + den[2]
                vqc = p_v[0] * xc + p_v[1] * yc + p_v[2]
                uqc = p_u[0] * xc + p_u[1] * yc + p_u[2]
                dv_dy = p_v[1] * dqc - den[1] * vqc
                du_dy = p_u[1] * dqc - den[1] * uqc
                swap = jnp.abs(dv_dy) < jnp.abs(du_dy)

                img_f = img_all[f]
                img2, pu2, pv2 = jax.lax.cond(
                    swap,
                    lambda: (img_f.swapaxes(-1, -2), p_v, p_u),
                    lambda: (img_f, p_u, p_v),
                )

                def do_warp(img2=img2, pu2=pu2, pv2=pv2):
                    return warp_face(img2, pu2, pv2, den, xg, yg,
                                     hi=n_eff_v - 1.0)

                warped = jax.lax.cond(
                    jnp.any(use_f),
                    do_warp,
                    lambda: jnp.zeros((4, ht, wt), jnp.float32),
                )
                rr = jnp.where(use_f, warped[0], rr)
                gg = jnp.where(use_f, warped[1], gg)
                bb = jnp.where(use_f, warped[2], bb)
                aa = jnp.where(use_f, warped[3], aa)

            # `PSCube.hlsl:57`: store only if 0 < w <= 1. The tent weights
            # round in bf16, so a legitimate alpha==1 sample can overshoot
            # by ~2^-8 — clamp rather than drop (dropping speckles dense
            # interiors); anything still > 1 would be garbage, but warped
            # alpha is a convex combination of in-range taps.
            aa = jnp.minimum(aa, 1.0)
            store_ok = (aa > 0.0) & valid
            zero = jnp.zeros_like(aa)
            z_new = jnp.where(store_ok, exit_z, FLT_MAX)
            r_new = jnp.where(store_ok, rr, zero)
            g_new = jnp.where(store_ok, gg, zero)
            b_new = jnp.where(store_ok, bb, zero)
            a_new = jnp.where(store_ok, aa, zero)

            # streaming nearest-K insertion, tile-local
            t5 = jax.lax.dynamic_slice(
                layers, (0, 0, y0, x0), (5, num_layers, ht, wt))
            z_t, r_t, g_t, b_t, a_t = (t5[c] for c in range(5))
            for k in range(num_layers):
                take = z_new < z_t[k]

                def swap_k(top, new):
                    old = top[k]
                    return top.at[k].set(jnp.where(take, new, old)), \
                        jnp.where(take, old, new)

                z_t, z_new = swap_k(z_t, z_new)
                r_t, r_new = swap_k(r_t, r_new)
                g_t, g_new = swap_k(g_t, g_new)
                b_t, b_new = swap_k(b_t, b_new)
                a_t, a_new = swap_k(a_t, a_new)

            return jax.lax.dynamic_update_slice(
                layers, jnp.stack([z_t, r_t, g_t, b_t, a_t]),
                (0, 0, y0, x0))

        new_carry = jax.lax.cond(
            visible, process, lambda layers: layers, carry,
        )
        return new_carry, None

    layers = jnp.concatenate([
        jnp.full((1, num_layers, height, width), FLT_MAX, jnp.float32),
        jnp.zeros((4, num_layers, height, width), jnp.float32),
    ])

    def run_group(layers, ids, tile_px, n_eff):
        wt = min(tile_px, width)
        ht = min(tile_px, height)
        # bbox centre guarantees full coverage whenever the footprint fits
        # the tile; for oversized footprints, anchoring on the projected
        # volume centre keeps the clip on the far (thin) side.
        cx = jnp.where(vx_hi[ids] - vx_lo[ids] <= wt,
                       (vx_lo[ids] + vx_hi[ids]) * 0.5, c0x[ids])
        cy = jnp.where(vy_hi[ids] - vy_lo[ids] <= ht,
                       (vy_lo[ids] + vy_hi[ids]) * 0.5, c0y[ids])
        x0 = jnp.clip(jnp.round(cx - wt * 0.5), 0, width - wt
                      ).astype(jnp.int32)
        y0 = jnp.clip(jnp.round(cy - ht * 0.5), 0, height - ht
                      ).astype(jnp.int32)
        xs = (
            ids.astype(jnp.int32),
            wi3[ids],
            per_object.world_view_proj[ids],
            eye_local[ids],
            x0,
            y0,
            n_eff_all[ids],
            cull.visible[ids],
        )
        layers, _ = jax.lax.scan(
            lambda c, x: body(c, x, ht, wt, n_eff), layers, xs)
        return layers

    full_px = max(width, height)
    if lod_order is not None and lod_buckets is not None:
        # footprint classes mirror the sweep's LOD buckets; the mip-0
        # bucket is further split by rank (the partition's secondary sort
        # is projected edge length, descending): only the very largest
        # volumes pay a full-screen tile, the rest a descending ladder.
        # Oversized footprints degrade gracefully (run_group anchors them
        # on the projected centre, clipping the far side).
        for (b0, count, size_b, mip_b) in lod_buckets:
            ids = jax.lax.dynamic_slice_in_dim(lod_order, b0, count)
            if mip_b == 0:
                ladder = [(2, full_px), (4, (full_px * 3) // 5),
                          (count, (full_px * 2) // 5)]
                at = 0
                for cap, tile_px in ladder:
                    take = min(cap, count - at)
                    if take <= 0:
                        break
                    layers = run_group(
                        layers, ids[at:at + take], tile_px, size_b)
                    at += take
            else:
                tile_b = max(128, min(tile, 6 * size_b))
                layers = run_group(layers, ids, tile_b, size_b)
    else:
        # no LOD info: full-extent maps; largest projected get the big tile
        n_big = min(_NUM_BIG, n) if tile < full_px else 0
        order = jnp.argsort(-cull.max_edge_px)
        if n_big:
            layers = run_group(layers, order[:n_big], full_px, s)
            layers = run_group(layers, order[n_big:], tile, s)
        else:
            layers = run_group(layers, jnp.arange(n), tile, s)

    return _underblend(layers[1], layers[2], layers[3], layers[4],
                       num_layers, height, width)
