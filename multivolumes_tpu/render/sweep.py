"""Plane-sweep view-space marching — the TPU-native fast path.

Same output contract as `raymarch.ray_march_view` (reference semantics:
`CSRayMarch.hlsl:77-158`), different algorithm. Instead of marching each
cube-map texel's ray independently (per-thread loop + dependent trilinear
gathers — the GPU-texture-unit formulation), exploit that every cube face
is axis-aligned: the set of sample points of *all* of a face's rays on a
plane parallel to that face is an axis-separable affine warp of a volume
z-slice:

    p(s; u, v) = eye * (1 - s) + s * (u, v, 1)      (face frame)

so marching plane k = two small dense matmuls (interp matrices x slice)
that run on the MXU, with zero gathers. Production runs the march as a
Pallas kernel (`ops/pallas/sweep_kernel.py`: VMEM-resident carry,
contiguous slab-window DMA, face/block/early-exit skips); this module's
`sweep_batched` is the XLA `lax.scan` twin the kernel is tested
against, plus the LOD orchestration both share. Per-ray step
lengths vary across a plane, so sample-based compositing uses opacity
correction: with f = dt/stepScale,

    T_mult = (1 - ABSORPTION*rho)^f,  scatter += C * T * (1 - T_mult)

which reduces exactly to the reference's per-sample update
(`CSRayMarch.hlsl:133-146`) when f == 1. Adaptive stepping (`GetStep`) is
unnecessary: the sweep samples every plane (denser than the reference's
adaptive march, never sparser at equal sample budgets).

The 6 cube faces reduce to one "+Z-like" sweep via three precomputed
transposes of the source volumes (`orient_variants`; per-face mirrors are
pure index arithmetic, `FACE_FLIPS`) and a per-face remap of the eye
point. Light maps are consumed through the same mechanism.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multivolumes_tpu.config import SharedConsts
from multivolumes_tpu.core import math3d
from multivolumes_tpu.render.cull import CullResult
from multivolumes_tpu.render.perframe import PerObject
from multivolumes_tpu.render.raymarch import CubeMaps

ABSORPTION = SharedConsts.ABSORPTION
ZERO_THRESHOLD = SharedConsts.ZERO_THRESHOLD
MAX_DIST = SharedConsts.MAX_DIST
FLT_MAX = 3.402823466e38


# Face -> (variant, z-flip, v-flip, u-flip). The six face frames reduce
# to THREE stored transposes (variant 0: [z,y,x]; 1: z<->x; 2: z<->y) —
# every flip is pure index arithmetic, folded into slab z addressing and
# the interp-matrix coordinates by both sweep implementations. Halves
# the oriented stacks' memory and the per-frame light orientation cost.
FACE_VARIANT = (1, 1, 2, 2, 0, 0)
FACE_FLIPS = (  # (z, v, u) per face, from the orient_volumes derivation
    (0, 0, 1),   # f0 +X: flip iu
    (1, 0, 0),   # f1 -X: flip iw
    (0, 1, 0),   # f2 +Y: flip iv
    (1, 0, 0),   # f3 -Y: flip iw
    (0, 0, 0),   # f4 +Z
    (1, 0, 1),   # f5 -Z: flip iw, iu
)


def orient_variants_cf(vol_cf):
    """(..., C, D, H, W) -> (..., 3, D, C, H, W): the three stored
    transposes (see FACE_VARIANT); faces address them with FACE_FLIPS."""
    zyx = vol_cf
    t_zx = jnp.swapaxes(vol_cf, -3, -1)
    t_zy = jnp.swapaxes(vol_cf, -3, -2)
    return jnp.stack(
        [jnp.swapaxes(v, -4, -3) for v in (zyx, t_zx, t_zy)], axis=-5)


def orient_variants(vol):
    """(..., D, H, W, C) -> (..., 3, D, C, H, W) slab-major variants."""
    return orient_variants_cf(jnp.moveaxis(vol, -1, -4))


def pad_light_lanes(lm):
    """Pad an oriented light stack's minor (u) axis to the 128-lane
    multiple the sweep kernel consumes. The stack is carried PADDED in
    SceneState so the full-stack pad (measured ~4 ms/frame at n=64)
    never runs inside the frame; padded texels get zero tent weights
    because interp coords clip to the TRUE extent (the `light_w`
    argument threaded through the sweep entry points)."""
    w = lm.shape[-1]
    wp = -(-w // 128) * 128
    if wp == w:
        return lm
    return jnp.pad(lm, ((0, 0),) * (lm.ndim - 1) + ((0, wp - w),))


def eye_to_face_frames(eye_local):
    """(..., 3) local eye -> (..., 6, 3) (eu, ev, ew) per face."""
    ex, ey, ez = eye_local[..., 0], eye_local[..., 1], eye_local[..., 2]
    frames = jnp.stack(
        [
            jnp.stack([-ez, ey, ex], -1),   # f0 +X
            jnp.stack([ez, ey, -ex], -1),   # f1 -X
            jnp.stack([ex, -ez, ey], -1),   # f2 +Y
            jnp.stack([ex, ez, -ey], -1),   # f3 -Y
            jnp.stack([ex, ey, ez], -1),    # f4 +Z
            jnp.stack([-ex, ey, -ez], -1),  # f5 -Z
        ],
        axis=-2,
    )
    return frames


def _interp_matrix(coords, n: int, dtype):
    """Linear-interp matrix W[j, t] = hat(coords[j] - t), clamp addressing.

    coords: (S,) continuous texel coords (already * n - 0.5 space).
    Matmul with this matrix == linear-clamp resampling.
    """
    s = coords.shape[0]
    t = jax.lax.broadcasted_iota(jnp.float32, (s, n), 1)
    c = jnp.clip(coords, 0.0, n - 1.0)[:, None]
    return jnp.maximum(1.0 - jnp.abs(c - t), 0.0).astype(dtype)


class SweepParams(NamedTuple):
    s_in: jnp.ndarray     # (..., S, S) per-ray entry parameter
    s_end: jnp.ndarray    # (..., S, S) per-ray end (exit & occlusion)
    ray_len: jnp.ndarray  # (..., S, S) |g - eye|
    active: jnp.ndarray   # (..., S, S) ray validity


def face_ray_params(eye_f, u, v, s_max=None):
    """Per-ray sweep parameters in the face frame.

    eye_f: (..., 3); u, v: (S,) face coords in [-1, 1];
    s_max: optional (..., S, S) occlusion bound in s.
    """
    eu, ev, ew = eye_f[..., 0:1, None], eye_f[..., 1:2, None], eye_f[..., 2:3, None]
    if u.ndim == 1:          # shared texel grid
        ug = u[None, :]
        vg = v[:, None]
    else:                    # per-batch grids (adaptive n_eff): (B, S)
        ug = u[:, None, :]
        vg = v[:, :, None]

    gx = ug - eu   # (..., S, S) broadcast: direction component (unnorm, s-param)
    gy = vg - ev
    gz = 1.0 - ew

    def slab(e, d):
        d_safe = jnp.where(jnp.abs(d) > 1e-12, d, jnp.where(d >= 0, 1e-12, -1e-12))
        s1 = (-1.0 - e) / d_safe
        s2 = (1.0 - e) / d_safe
        return jnp.minimum(s1, s2), jnp.maximum(s1, s2)

    ix, ox = slab(eu, gx)
    iy, oy = slab(ev, gy)
    iz, oz = slab(ew, gz)
    s_in = jnp.maximum(jnp.maximum(ix, iy), jnp.maximum(iz, 0.0))
    s_out = jnp.minimum(jnp.minimum(ox, oy), oz)

    ray_len = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    active = s_out > s_in
    s_end = jnp.minimum(s_out, 1.0)
    if s_max is not None:
        s_end = jnp.minimum(s_end, s_max)
    return SweepParams(s_in=s_in, s_end=s_end, ray_len=ray_len, active=active)


def sweep_batched(
    volumes_oriented,   # (N_src, 3, D, 4, H, W) slab-major variants
    light_oriented,     # (N, 3, Dl, 3, Hl, Wl) slab-major variants
    vol_tex_ids,        # (N,)
    eye_faces,          # (N, 6, 3)
    params: SweepParams,  # fields (N, 6, S, S)
    smp_count,          # (N,)
    run_mask,           # (N, 6) which faces to march
    num_planes: int,
    size: int,
    dtype=jnp.float32,
    n_eff_b=None,        # (N,) per-volume effective resolution (<= size)
    light_ids=None,      # (N,) rows of light_oriented to use (default 0..N)
    light_w: int | None = None,   # true light u extent (lane-padded input)
    vol_zmax=None,       # accepted for pallas-twin symmetry; the twin's
                         # dense scan gains nothing from block skipping
):
    """March all (volume, face) pairs as one batched plane scan.

    The batch axis B = N*6 rides the MXU's batched-matmul path; each scan
    step does per-channel slab gathers and two batched einsums.
    Returns (N, 6, 4, S, S) scatter (channel-mid, see CubeMaps).
    """
    if light_w is not None and light_oriented.shape[-1] != light_w:
        light_oriented = light_oriented[..., :light_w]  # twin: drop pad
    n = vol_tex_ids.shape[0]
    b = n * 6
    d, h, w = (volumes_oriented.shape[2], volumes_oriented.shape[4],
               volumes_oriented.shape[5])
    dl, hl, wl = (light_oriented.shape[2], light_oriented.shape[4],
                  light_oriented.shape[5])
    assert volumes_oriented.shape[1] == 3 and light_oriented.shape[1] == 3, \
        "sweep consumes 3-variant oriented stacks (orient_variants[_cf])"

    eye_b = eye_faces.reshape(b, 3)
    eu, ev, ew = eye_b[:, 0], eye_b[:, 1], eye_b[:, 2]
    ew_c = jnp.clip(ew, -1.0, 1.0)
    delta = (1.0 - ew_c) / num_planes                      # (B,)
    inv_gz = 1.0 / jnp.maximum(1.0 - ew, 1e-6)

    tex_b = jnp.repeat(vol_tex_ids.astype(jnp.int32), 6)   # (B,)
    lm_b = jnp.repeat(
        jnp.arange(n, dtype=jnp.int32) if light_ids is None
        else light_ids.astype(jnp.int32), 6)
    var_b = jnp.tile(jnp.asarray(FACE_VARIANT, jnp.int32), n)
    flips = jnp.asarray(FACE_FLIPS, jnp.float32)           # (6, 3)
    zf_b = jnp.tile(flips[:, 0], n)                        # (B,)
    vf_b = jnp.tile(flips[:, 1], n)
    uf_b = jnp.tile(flips[:, 2], n)

    if n_eff_b is None:
        u = jnp.broadcast_to(
            (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2.0 - 1.0,
            (b, size))
    else:
        ne = jnp.repeat(n_eff_b.astype(jnp.float32), 6)[:, None]
        u = (jnp.arange(size, dtype=jnp.float32)[None] + 0.5) / ne * 2.0 - 1.0
    v = -u

    s_in = params.s_in.reshape(b, size, size)
    s_end = params.s_end.reshape(b, size, size)
    ray_len = params.ray_len.reshape(b, size, size)
    ray_ok = params.active.reshape(b, size, size) & run_mask.reshape(b)[:, None, None]

    step_scale = MAX_DIST / jnp.maximum(
        jnp.repeat(smp_count, 6).astype(jnp.float32), 1.0
    )                                                       # (B,)
    ds = delta * inv_gz                                     # (B,)
    f_corr = (ds[:, None, None] * ray_len) / step_scale[:, None, None]

    # Plane blocking: TPU scan steps on tiny batched matmuls are
    # dispatch-bound, so process P planes per step and resolve the
    # front-to-back recurrence with an exclusive cumulative product over
    # the block (associative, exact):
    #   T_k = T_carry * prod_{j<k} A_j;  scatter += C_k*(1-A_k)*T_k
    # Block size adapts to the face batch: slab transients scale with
    # B * P * C * H * W, so cap B*P (~1k faces-planes keeps transients
    # under ~1 GB at 128^3 volumes).
    p_block = max(1, min(8, 1024 // max(b, 1)))
    while num_planes % p_block != 0 and p_block > 1:
        p_block -= 1
    n_blocks = num_planes // p_block

    def slab_block(stack, idx0, w_ks, dd, n_ch):
        """P planes of slabs from the slab-major [src, variant, z, c, y, x]
        stack: -> (B, P, C, H', W'). The face's z flip folds into the
        slice coordinate (FACE_FLIPS); lateral flips fold into the interp
        coordinates downstream."""
        del n_ch
        zc = (w_ks * 0.5 + 0.5) * dd - 0.5            # (B,P)
        zc = zc + zf_b[:, None] * ((dd - 1.0) - 2.0 * zc)  # z-flip fold
        z0 = jnp.clip(jnp.floor(zc).astype(jnp.int32), 0, dd - 1)
        z1 = jnp.clip(z0 + 1, 0, dd - 1)
        fz = jnp.clip(zc - jnp.floor(zc), 0.0, 1.0).astype(dtype)
        idx_bp = jnp.broadcast_to(idx0[:, None], z0.shape)
        var_bp = jnp.broadcast_to(var_b[:, None], z0.shape)
        s0 = stack[idx_bp, var_bp, z0]                 # (B,P,C,H,W)
        s1 = stack[idx_bp, var_bp, z1]
        fz = fz[..., None, None, None]
        return s0 * (1 - fz) + s1 * fz

    def interp_bp(coords, nn, lat_flip):
        """(B, P, S) coords -> (B, P, S, nn) interp matrices; lat_flip
        (B,) folds the face's lateral mirror into the coordinates."""
        t = jax.lax.broadcasted_iota(jnp.float32, (1, 1, size, nn), 3)
        c = jnp.clip(coords, 0.0, nn - 1.0)
        c = c + lat_flip[:, None, None] * ((nn - 1.0) - 2.0 * c)
        c = c[..., None]
        return jnp.maximum(1.0 - jnp.abs(c - t), 0.0).astype(dtype)

    def body(carry, blk):
        transm, sr, sg, sb, sa = carry
        ks = blk * p_block + jnp.arange(p_block, dtype=jnp.int32)  # (P,)
        w_ks = ew_c[:, None] + (ks[None].astype(jnp.float32) + 0.5) * delta[:, None]
        s_ks = (w_ks - ew[:, None]) * inv_gz[:, None]              # (B,P)

        pu = eu[:, None, None] + s_ks[..., None] * (u[:, None, :] - eu[:, None, None])
        pv = ev[:, None, None] + s_ks[..., None] * (v[:, None, :] - ev[:, None, None])

        slab = slab_block(volumes_oriented, tex_b, w_ks, d, 4)     # (B,P,4,H,W)
        wx = interp_bp((pu * 0.5 + 0.5) * w - 0.5, w, uf_b)        # (B,P,S,W)
        wy = interp_bp((pv * 0.5 + 0.5) * h - 0.5, h, vf_b)
        tmp = jnp.einsum("bpjw,bpchw->bpchj", wx, slab.astype(dtype),
                         preferred_element_type=jnp.float32)
        plane = jnp.einsum("bpih,bpchj->bpcij", wy, tmp.astype(dtype),
                           preferred_element_type=jnp.float32)     # (B,P,4,S,S)

        lslab = slab_block(light_oriented, lm_b, w_ks, dl, 3)
        wxl = interp_bp((pu * 0.5 + 0.5) * wl - 0.5, wl, uf_b)
        wyl = interp_bp((pv * 0.5 + 0.5) * hl - 0.5, hl, vf_b)
        tmpl = jnp.einsum("bpjw,bpchw->bpchj", wxl, lslab.astype(dtype),
                          preferred_element_type=jnp.float32)
        light = jnp.einsum("bpih,bpchj->bpcij", wyl, tmpl.astype(dtype),
                           preferred_element_type=jnp.float32)     # (B,P,3,S,S)

        rho = jnp.clip(plane[:, :, 3], 0.0, 1.0)                   # (B,P,S,S)
        sk = s_ks[..., None, None]
        live = (
            (rho > ZERO_THRESHOLD)
            & (sk >= s_in[:, None]) & (sk <= s_end[:, None])
            & ray_ok[:, None]
        )

        a_mult = jnp.exp2(
            f_corr[:, None] * jnp.log2(jnp.maximum(1.0 - rho * ABSORPTION, 1e-7))
        )
        a_mult = jnp.where(live, a_mult, 1.0)

        # exclusive prefix product along the plane axis
        prefix = jnp.cumprod(a_mult, axis=1)
        excl = jnp.concatenate(
            [jnp.ones_like(prefix[:, :1]), prefix[:, :-1]], axis=1
        )
        t_k = transm[:, None] * excl                               # (B,P,S,S)
        amt = t_k * (1.0 - a_mult)
        amt = jnp.where(live, amt, 0.0)
        sr = sr + jnp.sum(plane[:, :, 0] * light[:, :, 0] * amt, axis=1)
        sg = sg + jnp.sum(plane[:, :, 1] * light[:, :, 1] * amt, axis=1)
        sb = sb + jnp.sum(plane[:, :, 2] * light[:, :, 2] * amt, axis=1)
        sa = sa + jnp.sum(amt, axis=1)
        transm = transm * prefix[:, -1]
        return (transm, sr, sg, sb, sa), None

    z0_ = jnp.zeros((b, size, size), jnp.float32)
    init = (jnp.ones((b, size, size), jnp.float32), z0_, z0_, z0_, z0_)
    (_t, sr, sg, sb, sa), _ = jax.lax.scan(
        body, init, jnp.arange(n_blocks, dtype=jnp.int32)
    )
    scatter = jnp.stack([sr, sg, sb, sa], 1)  # (B,4,S,S)
    return scatter.reshape(n, 6, 4, size, size)


def _sweep_batched_impl(impl: str):  # noqa: D401
    """"pallas" -> the VMEM-resident march kernel (production);
    "xla" -> the einsum scan above (semantics twin / goldens)."""
    if impl == "pallas":
        from multivolumes_tpu.ops.pallas.sweep_kernel import (
            sweep_batched_pallas,
        )

        return sweep_batched_pallas
    return sweep_batched


def ray_march_view_sweep(
    volumes_oriented,     # (N_src, 3, D, 4, H, W) slab-major variants
    vol_tex_ids,          # (N,)
    light_maps_oriented,  # (N, 3, Dl, 3, Hl, Wl) slab-major variants
    per_object: PerObject,
    cull: CullResult,
    eye,
    depth_map,            # (Hd, Wd) or None
    cube_map_size: int,
    num_planes: int | None = None,
    dtype=jnp.float32,
    impl: str = "pallas",
    light_w: int | None = None,
    vol_zmax=None,
) -> CubeMaps:
    """Sweep-march every (volume, face) cube map. Output contract matches
    `raymarch.ray_march_view` marched at mip 0 (consumers should treat the
    maps as full-resolution; LOD still drives the scheme decision)."""
    n = vol_tex_ids.shape[0]
    s = cube_map_size
    k = num_planes or s

    eye_local = math3d.transform_point3(eye, per_object.world_i)  # (N, 3)
    eye_faces = eye_to_face_frames(eye_local)                     # (N, 6, 3)

    u = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s * 2.0 - 1.0
    v = -u

    if depth_map is not None:
        s_max, cube_depth = _occlusion_s_max(
            per_object, eye_local, eye_faces, depth_map, s
        )
    else:
        s_max = None
        cube_depth = jnp.ones((n, 6, s, s), jnp.float32)

    params = face_ray_params(
        eye_faces.reshape(n * 6, 3), u, v,
        None if s_max is None else s_max.reshape(n * 6, s, s),
    )
    params = SweepParams(*(x.reshape(n, 6, s, s) for x in params))

    run_mask = (
        cull.face_mask
        & cull.visible[:, None]
        & cull.use_cube_map[:, None]
    )

    scatter = _sweep_batched_impl(impl)(
        volumes_oriented, light_maps_oriented, vol_tex_ids, eye_faces,
        params, cull.smp_count, run_mask, k, s, dtype, light_w=light_w,
        vol_zmax=vol_zmax,
    )
    scatter = scatter.at[:, :, :3].mul(1.0 / (2.0 * math.pi))
    scatter = scatter * run_mask[:, :, None, None, None]
    return CubeMaps(color=scatter, depth=cube_depth)


def _roll_edge(x, d: int, axis: int):
    """Edge-clamped shift along `axis` built from slices + pad (index
    shifts lower to per-element gathers on TPU)."""
    if d == 0:
        return x
    sl = [slice(None)] * x.ndim
    pads = [(0, 0)] * x.ndim
    if d > 0:
        sl[axis] = slice(d, None)
        pads[axis] = (0, d)
    else:
        sl[axis] = slice(None, d)
        pads[axis] = (-d, 0)
    return jnp.pad(x[tuple(sl)], pads, mode="edge")


def _dilate3_max(x):
    """3x3 max over the last two dims (separable, edge-clamped)."""
    for ax in (-2, -1):
        x = jnp.maximum(
            jnp.maximum(_roll_edge(x, 1, ax), _roll_edge(x, -1, ax)), x)
    return x


def _pool2_max(d):
    """2x2 stride-2 max-pool of a scene depth map (z = 1 far, so max =
    farther: the derived occlusion bound s_max can only GROW, and
    overshoot is clipped by the composite's per-pixel depth test — the
    same conservative-loosening family as `_dilate3_max`). Why: the
    depth pair-table the per-texel tap gathers from is a full
    relayout copy of the depth map (traced ~0.9 ms/frame at 1280x800,
    sweep.py `_occlusion_s_max`); pooling shrinks it 4x."""
    hd, wd = d.shape
    if hd % 2 or wd % 2:
        return d
    return jax.lax.reduce_window(
        d, -FLT_MAX, jax.lax.max, (2, 2), (2, 2), "VALID")


def _upsample2_nearest(x, s: int):
    """(..., s/2, s/2) -> (..., s, s) nearest, as two replication
    matmuls: a lane-axis 2x interleave is the slow relayout shape on
    TPU, a (s/2, s) one-hot matmul rides the MXU."""
    h = s // 2
    u_cols = jnp.repeat(jnp.eye(h, dtype=x.dtype), 2, axis=1)   # (h, s)
    y = jnp.einsum("...jk,kl->...jl", x, u_cols)
    return jnp.einsum("sj,...jk->...sk", u_cols.T, y)


def _occlusion_s_max(per_object, eye_local, eye_faces, depth_map, s,
                     n_eff=None):
    """Scene-depth occlusion per texel, as the reference's GetClipPos +
    GetTMax (`CSRayMarch.hlsl:102-107`) but expressed in the sweep's
    s-parameter. Also returns the cube depth maps (the sampled scene z).

    n_eff: optional (N,) per-volume effective resolution — texel centres
    at (i + 0.5) / n_eff (the packed-corner convention); texels beyond a
    volume's corner produce out-of-face garbage that the ray mask kills.

    SoA throughout (see raymarch.py layout note)."""
    n = eye_local.shape[0]
    ij = jnp.arange(s, dtype=jnp.float32)
    jj, ii = jnp.meshgrid(ij, ij, indexing="ij")
    denom = (jnp.asarray(float(s)) if n_eff is None
             else n_eff.astype(jnp.float32)[:, None, None, None])
    px = (ii[None, None] + 0.5) / denom * 2.0 - 1.0
    py = -((jj[None, None] + 0.5) / denom * 2.0 - 1.0)
    px = jnp.broadcast_to(px, (n, 6, s, s))
    py = jnp.broadcast_to(py, (n, 6, s, s))

    from multivolumes_tpu.render.raymarch import (
        get_local_pos_soa, compute_ray_origin_soa, get_t_max_soa,
        _transform_point_soa, _safe,
    )

    face = jnp.arange(6, dtype=jnp.int32)[None, :, None, None]
    tx, ty, tz = get_local_pos_soa(px, py, face)

    ex = eye_local[:, 0, None, None, None]
    ey = eye_local[:, 1, None, None, None]
    ez = eye_local[:, 2, None, None, None]
    dxu, dyu, dzu = tx - ex, ty - ey, tz - ez
    il = jax.lax.rsqrt(jnp.maximum(dxu * dxu + dyu * dyu + dzu * dzu, 1e-20))
    dx, dy, dz = dxu * il, dyu * il, dzu * il

    ox = jnp.broadcast_to(ex, tx.shape)
    oy = jnp.broadcast_to(ey, tx.shape)
    oz = jnp.broadcast_to(ez, tx.shape)
    ox, oy, oz, _hit = compute_ray_origin_soa(ox, oy, oz, dx, dy, dz)

    prx, pry, prz = ox + 0.01 * dx, oy + 0.01 * dy, oz + 0.01 * dz
    wvp = per_object.world_view_proj[:, None, None, None]
    hx, hy, _hz, hw = _transform_point_soa(prx, pry, prz, wvp)
    hw = _safe(hw, 1e-20)
    cx, cy = hx / hw, hy / hw
    uu = cx * 0.5 + 0.5
    vv = 1.0 - (cy * 0.5 + 0.5)
    hd, wd = depth_map.shape
    xi = jnp.clip((uu * wd).astype(jnp.int32), 0, wd - 1)
    yi = jnp.clip((vv * hd).astype(jnp.int32), 0, hd - 1)
    if wd % 2 == 0:
        # nearest depth tap as a 1-D pair-row gather: the pair table is
        # a free reshape and 1-D row gathers run ~2x the 2-D element
        # rate (docs/ARCHITECTURE.md row-gather fact) — this pass taps
        # ~1.6M texels per frame at the demo config
        half = wd // 2
        pair = depth_map.reshape(hd * half, 2)[yi * half + (xi >> 1)]
        z = jnp.where((xi & 1) == 1, pair[..., 1], pair[..., 0])
    else:
        z = depth_map[yi, xi]
    t_max = get_t_max_soa(
        cx, cy, z, ox, oy, oz, dx, dy, dz,
        per_object.world_view_proj_i[:, None, None, None],
    )

    # s is measured from the eye: p = eye + s*(g - eye); the reference's t
    # is measured from the box-clipped origin along the unit direction:
    # s_of_t = (|origin - eye| + t) / |g - eye|.
    lx, ly_, lz = tx - ex, ty - ey, tz - ez
    L = jnp.sqrt(lx * lx + ly_ * ly_ + lz * lz)
    t0x, t0y, t0z = ox - ex, oy - ey, oz - ez
    t0 = jnp.sqrt(t0x * t0x + t0y * t0y + t0z * t0z)
    s_max = (t0 + jnp.minimum(t_max, FLT_MAX)) / jnp.maximum(L, 1e-12)
    s_max = jnp.where(t_max >= FLT_MAX * 0.5, FLT_MAX, s_max)
    return s_max, z


def ray_march_view_sweep_lod_sharded(
    mesh,
    volumes_oriented,     # (N_src, 3, D, 4, H, W) REPLICATED
    vol_tex_ids,          # (N,) volume-sharded
    light_maps_oriented,  # (N, 3, Dl, 3, Hl, Wl) REPLICATED
    per_object: PerObject,  # volume-sharded
    cull: CullResult,       # volume-sharded
    eye,
    depth_map,
    cube_map_size: int,
    dtype=jnp.float32,
    bucket_caps=(8, 24, 1 << 30),
    impl: str = "pallas",
    pack: bool = False,
    light_w: int | None = None,
    vol_zmax=None,
    sorted_output: bool = False,
    light_sharded: bool = False,
    swap_basis=None,  # see ray_march_view_sweep_lod
):
    """Multi-chip LOD sweep: genuinely partition the march over the
    volume axis with `jax.shard_map` (GSPMD cannot partition the opaque
    Mosaic kernel itself, so without this the sweep would run replicated
    per device). Each device LOD-buckets and marches its own N/D volumes
    (bucket caps scale down per device — per-chip caps are the honest
    multi-chip reading of the work-graph capacity limits); the sharded
    cube maps then all-gather (~0.8 MB/volume) into the replicated
    screen-space composite — the SURVEY section-2.6 plan. The big
    slow-changing source volumes stay replicated (their refresh is
    amortized, the per-frame march is not); the per-volume LIGHT stacks
    stay replicated by default but shard over the volume axis with
    `light_sharded=True` (config.shard_light_stacks — multi-chip MEMORY
    scaling: each device reads only its local shard, so no collective
    ever moves a stack).
    """
    from jax.sharding import PartitionSpec as P

    axis = "volumes"
    nd = mesh.shape[axis]
    n = vol_tex_ids.shape[0]
    assert n % nd == 0, (n, nd)
    caps = tuple(c if c >= (1 << 20) else max(1, c // nd)
                 for c in bucket_caps)

    def local_fn(vol_or, tex_l, lm_in, po_l, cull_l, eye_, depth_, vz_,
                 *extra):
        d = jax.lax.axis_index(axis)
        nl = tex_l.shape[0]
        # replicated stack: slice this device's volumes out locally;
        # sharded stack: lm_in IS the local shard already
        lm_l = (lm_in if light_sharded
                else jax.lax.dynamic_slice_in_dim(lm_in, d * nl, nl, 0))
        out = ray_march_view_sweep_lod(
            vol_or, tex_l, lm_l, po_l, cull_l, eye_, depth_,
            cube_map_size, dtype=dtype, bucket_caps=caps, impl=impl,
            pack=pack, light_w=light_w, vol_zmax=vz_,
            sorted_output=sorted_output,
            swap_basis=extra[0] if extra else None,
        )
        if sorted_output and swap_basis is not None:
            cm, mips, order_l, swap_l = out
            return (cm.color, cm.depth, mips, order_l + d * nl, swap_l)
        if sorted_output:
            cm, mips, order_l = out
            # local sorted row j = global volume d*nl + order_l[j]; the
            # concatenated out_spec makes the global order a valid
            # permutation of 0..N-1
            return cm.color, cm.depth, mips, order_l + d * nl
        cm, mips = out
        return cm.color, cm.depth, mips

    n_out = (5 if sorted_output and swap_basis is not None
             else 4 if sorted_output else 3)
    extra = () if swap_basis is None else (swap_basis,)
    outs = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis) if light_sharded else P(),
                  P(axis), P(axis), P(), P(), P())
        + ((P(),) if extra else ()),
        out_specs=(P(axis),) * n_out,
        check_vma=False,
    )(volumes_oriented, vol_tex_ids, light_maps_oriented, per_object,
      cull, eye, depth_map, vol_zmax, *extra)
    if sorted_output and swap_basis is not None:
        color, depth, mips, order, swap_sorted = outs
        return CubeMaps(color=color, depth=depth), mips, order, swap_sorted
    if sorted_output:
        color, depth, mips, order = outs
        return CubeMaps(color=color, depth=depth), mips, order
    color, depth, mips = outs
    return CubeMaps(color=color, depth=depth), mips


def lod_partition(cull: CullResult, n: int, cube_map_size: int,
                  bucket_caps):
    """Rank volumes for LOD bucketing; shared by the sweep and the warp
    composite so both agree on each volume's bucket.

    Sort key: mip ascending (the reference's per-volume LOD estimate,
    `VolumeCull.hlsli:267-294`), ties broken by projected edge length
    descending, invisible volumes last. Returns (order, buckets) with
    buckets = [(start, count, size_b, mip_b), ...] — a static layout.
    """
    s = cube_map_size
    edge = jnp.clip(cull.max_edge_px, 0.0, 65535.0).astype(jnp.int32)
    sort_key = jnp.where(
        cull.visible, cull.mip_level * (1 << 17) + (65536 - edge), 1 << 30
    )
    order = jnp.argsort(sort_key)

    buckets = []
    start = 0
    mip = 0
    for cap in bucket_caps:
        size_b = max(s >> mip, 8)
        count = min(cap, n - start)
        if count > 0:
            buckets.append((start, count, size_b, mip))
            start += count
        mip += 1
        if start >= n:
            break
    while start < n:  # leftover beyond the last cap: smallest bucket
        _s0, c0, size_b, mip_b = buckets[-1]
        buckets[-1] = (_s0, c0 + (n - start), size_b, mip_b)
        start = n
    return order, buckets


def ray_march_view_sweep_lod(
    volumes_oriented,     # (N_src, 3, D, 4, H, W) slab-major variants
    vol_tex_ids,          # (N,)
    light_maps_oriented,  # (N, 3, Dl, 3, Hl, Wl) slab-major variants
    per_object: PerObject,
    cull: CullResult,
    eye,
    depth_map,
    cube_map_size: int,
    dtype=jnp.float32,
    bucket_caps=(8, 24, 1 << 30),
    impl: str = "pallas",
    pack: bool = True,
    light_w: int | None = None,
    vol_zmax=None,
    sorted_output: bool = False,
    order=None,  # precomputed lod_partition order (batched-prep scan)
    swap_basis=None,  # (3, 3) warp.screen_basis: emit faces pre-swapped
                      # for the tile composite (+ depth pre-unprojected)
                      # and additionally return the (N, 6) swap flags —
                      # the tile prep then consumes the maps as-is
                      # instead of re-materializing the whole stack
                      # (sorted_output only)
):
    """LOD-bucketed sweep: the honest work-graph equivalent.

    The reference sizes each volume's cube-map dispatch by its projected
    LOD through GPU-driven ExecuteIndirect / work graphs
    (`LibRayMarch.hlsl:39-134`). Static XLA shapes cannot dispatch
    dynamically, so volumes are *sorted by mip* and assigned to fixed-
    capacity resolution buckets (S, S/2, S/4): the largest-on-screen
    volumes sweep at full resolution, the rest at halved ones — per-face
    cost scales with S_b^2, a ~4x cut at 64 volumes. Capacity overflow
    degrades a volume one LOD step (never drops it).

    Outputs are f16-pair packed (N, 6, 2, S, S); each volume's map
    occupies the top-left (S>>mip)^2 corner and the returned mips feed the
    composite's n_eff.

    sorted_output=True returns (maps, mips, order) with the map/depth
    ROWS in bucket-sorted order (row j = volume order[j]; mips stay in
    original volume indexing): each bucket then lands as one static-
    offset `dynamic_update_slice` instead of a `.at[ids].set` scatter —
    the dynamic-index scatter lowers to a serialized while loop of
    per-volume copies (~1.3 ms/frame at n=64, traced). The tile
    composite consumes the sorted rows directly by permuting its small
    per-volume tensors with the same order (render/tilecast.py).
    """
    n = vol_tex_ids.shape[0]
    s = cube_map_size

    eye_local = math3d.transform_point3(eye, per_object.world_i)
    eye_faces = eye_to_face_frames(eye_local)

    # Occlusion bounds are sampled per bucket at bucket resolution on the
    # per-volume n_eff texel grid (the packed-corner convention the maps
    # and the gather composite's depth taps use) — full-resolution
    # sampling for all volumes cost N*6*S^2 gathers (~100 ms at n=64
    # with a mesh) and mis-aligned sub-bucket mips.
    cube_depth = jnp.ones((n, 6, s, s), jnp.float32)

    # one shared conservative depth source for every bucket's bound
    occl_depth = _pool2_max(depth_map) if depth_map is not None else None

    run_mask_full = cull.face_mask & cull.visible[:, None]

    order_own, buckets = lod_partition(cull, n, s, bucket_caps)
    order = order_own if order is None else order

    # packed f16-pair storage (N, 6, 2, S, S) for the gather composite;
    # the warp composite consumes plain channels (pack=False) in the
    # compute dtype
    from multivolumes_tpu.render.composite import pack_cube_f16

    assert swap_basis is None or (sorted_output and not pack), \
        "swap_basis is a tile-composite (sorted, unpacked) contract"
    swap_parts = []

    if pack:
        color = jnp.zeros((n, 6, 2, s, s), jnp.float32)
    else:
        color = jnp.zeros((n, 6, 4, s, s), dtype)
    mips = jnp.zeros((n,), jnp.int32)
    # sorted_output assembles by CONCATENATING padded bucket pieces
    # (bucket spans [b0, b0+count) tile the row axis exactly): the
    # dynamic-update-slice form copied the whole (N, 6, 4, S, S) buffer
    # once per bucket (~0.86 ms/frame at n=64, traced
    # dynamic-update-slice.355/356) because the chained DUS ops never
    # go in-place across the pallas-call boundary; a concat of pad ops
    # writes each byte exactly once.
    color_parts, depth_parts = [], []

    max_mip = max((s // 8).bit_length() - 1, 0)  # deepest level (>= 8 texels)
    for (b0, count, size_b, mip_b) in buckets:
        ids = jax.lax.dynamic_slice_in_dim(order, b0, count)  # (count,)

        # Per-volume EFFECTIVE resolution: the reference's estimated mip
        # (`EstimateCubeMapLOD`, VolumeCull.hlsli:267-294 — cube texel
        # density ~ screen density), floored by the bucket's capacity
        # level. Volumes the adaptive scheme routes off the cube-map path
        # (coverage < cube pixels, `CSVolumeCull.hlsl:64-71`) march one
        # level deeper still — the TPU-native realization of the
        # per-pixel expert: their march cost ~ their pixel coverage.
        actual = jnp.clip(cull.mip_level[ids], 0, max_mip)
        scheme_off = ~cull.use_cube_map[ids]
        eff_mip = jnp.clip(
            jnp.maximum(actual + scheme_off.astype(jnp.int32), mip_b),
            mip_b, max_mip,
        )
        n_eff_v = (s >> eff_mip).astype(jnp.float32)      # (count,)

        if swap_basis is not None:
            # tile-composite resample orientation (one shared function
            # with the tile prep — see warp.catmull_swap_flags): the
            # bucket's images are emitted pre-transposed where the flag
            # says so, and the flags ride back with the sorted rows
            from multivolumes_tpu.render.warp import catmull_swap_flags

            swap_b = catmull_swap_flags(
                swap_basis, per_object.world_i[ids],
                per_object.world_view_proj[ids], eye_local[ids],
                n_eff_v)                                   # (count, 6)
            swap_parts.append(swap_b)

        ar = jnp.arange(size_b, dtype=jnp.float32)
        u = (ar[None] + 0.5) / n_eff_v[:, None] * 2.0 - 1.0   # (count, S_b)
        u6 = jnp.repeat(u, 6, axis=0)                          # (count*6, S_b)
        v6 = -u6

        eye_f_b = eye_faces[ids]
        if depth_map is not None:
            po_b = PerObject(*(x[ids] for x in per_object))
            if size_b >= 64:
                # QUARTER-resolution occlusion bounds for the big
                # buckets: the per-texel depth tap is the sweep's
                # dominant glue (traced ~1.2 ms/frame at n=64 + mesh
                # incl. the gather's layout copies) and drops 16x here.
                # Conservative by the same two mechanisms as the
                # half-res path below, with the source strengthened to
                # match the coarser grid: the tap reads a 4x4
                # MAX-pooled depth (z = 1 far, so every fine pixel
                # under a coarse tap sees a bound >= its own farthest
                # depth) and the 3x3 coarse max-dilate covers the
                # projection slop between a cell's fine texels and its
                # centre. s_max still only GROWS vs the exact tap;
                # overshoot is clipped by the composite's per-pixel
                # depth test. The cube DEPTH map (CubeCast weights)
                # coarsens with it — seam impact is bounded by the
                # demo-scale fidelity number (tools/fidelity_demo.py).
                sc = size_b // 4
                occl4 = _pool2_max(occl_depth)
                s_max_c, depth_c = _occlusion_s_max(
                    po_b, eye_local[ids], eye_f_b, occl4, sc,
                    n_eff=n_eff_v * 0.25)
                s_max_b = _upsample2_nearest(_upsample2_nearest(
                    _dilate3_max(s_max_c), size_b // 2), size_b)
                depth_b = _upsample2_nearest(_upsample2_nearest(
                    depth_c, size_b // 2), size_b)
            elif size_b >= 32:
                # Occlusion bounds at HALF the bucket resolution: the
                # depth tap is one gather per ray (measured ~6.8 ms at
                # n=64 + mesh), and s_max is smooth away from mesh
                # silhouettes. The coarse grid's texel centres are the
                # fine pairs' midpoints ((j+0.5)/(n_eff/2)); a 3x3 max-
                # dilate before nearest upsampling keeps the bound
                # CONSERVATIVE (s_max only grows -> never truncates a
                # ray the exact tap would march; the composite's
                # per-pixel depth test still clips mesh overlap). Dead
                # texels beyond a volume's packed corner hold FLT_MAX-
                # ish garbage, which max-dilation can only loosen.
                sc = size_b // 2
                s_max_c, depth_c = _occlusion_s_max(
                    po_b, eye_local[ids], eye_f_b, occl_depth, sc,
                    n_eff=n_eff_v * 0.5)
                s_max_b = _upsample2_nearest(
                    _dilate3_max(s_max_c), size_b)
                depth_b = _upsample2_nearest(depth_c, size_b)
            else:
                s_max_b, depth_b = _occlusion_s_max(
                    po_b, eye_local[ids], eye_f_b, occl_depth, size_b,
                    n_eff=n_eff_v)
            if sorted_output:
                if swap_basis is not None:
                    # the tile kernel consumes VIEW-distance depth in the
                    # swapped orientation (`tilecast._tile_prep`): fold
                    # the elementwise unproject + per-face transpose into
                    # this one assembly write; pad = unproject(1) = Z_FAR
                    from multivolumes_tpu.config import SharedConsts
                    from multivolumes_tpu.render.composite import (
                        unproject_z,
                    )

                    depth_b = unproject_z(depth_b.astype(jnp.float32))
                    depth_b = jnp.where(
                        swap_b[:, :, None, None],
                        jnp.swapaxes(depth_b, -1, -2), depth_b)
                    pad_val = float(SharedConsts.Z_FAR)
                else:
                    pad_val = 1.0  # far clip, like the init
                depth_parts.append(jnp.pad(
                    depth_b,
                    ((0, 0), (0, 0), (0, s - size_b), (0, s - size_b)),
                    constant_values=pad_val))
            else:
                cube_depth = cube_depth.at[
                    ids, :, 0:size_b, 0:size_b].set(depth_b)
        else:
            s_max_b = None

        params = face_ray_params(
            eye_f_b.reshape(count * 6, 3), u6, v6,
            None if s_max_b is None else s_max_b.reshape(count * 6, size_b, size_b),
        )
        # rays beyond a volume's n_eff corner are dead
        in_corner = (ar[None, None, :] < n_eff_v[:, None, None]) \
            & (ar[None, :, None] < n_eff_v[:, None, None])     # (count,S,S)
        active = params.active.reshape(count, 6, size_b, size_b) \
            & in_corner[:, None]
        params = SweepParams(
            *(x.reshape(count, 6, size_b, size_b)
              for x in (params.s_in, params.s_end, params.ray_len)),
            active,
        )

        scatter = _sweep_batched_impl(impl)(
            volumes_oriented, light_maps_oriented, vol_tex_ids[ids],
            eye_f_b, params, cull.smp_count[ids], run_mask_full[ids],
            size_b, size_b, dtype, n_eff_b=n_eff_v, light_ids=ids,
            light_w=light_w, vol_zmax=vol_zmax,
        )  # (count, 6, 4, size_b, size_b)
        scatter = scatter.at[:, :, :3].mul(1.0 / (2.0 * math.pi))
        scatter = scatter * run_mask_full[ids][:, :, None, None, None]

        if pack:
            out_b = pack_cube_f16(scatter)  # (count, 6, 2, size_b, size_b)
        else:
            out_b = scatter.astype(dtype)
        if sorted_output:
            if swap_basis is not None:
                out_b = jnp.where(
                    swap_b[:, :, None, None, None],
                    jnp.swapaxes(out_b, -1, -2), out_b)
            color_parts.append(jnp.pad(
                out_b, ((0, 0), (0, 0), (0, 0),
                        (0, s - size_b), (0, s - size_b))))
        else:
            color = color.at[ids, :, :, 0:size_b, 0:size_b].set(out_b)
        mips = mips.at[ids].set(eff_mip)

    if sorted_output:
        color = (color_parts[0] if len(color_parts) == 1
                 else jnp.concatenate(color_parts, axis=0))
        if depth_parts:
            cube_depth = (depth_parts[0] if len(depth_parts) == 1
                          else jnp.concatenate(depth_parts, axis=0))
        if swap_basis is not None:
            swap_sorted = (swap_parts[0] if len(swap_parts) == 1
                           else jnp.concatenate(swap_parts, axis=0))
            return (CubeMaps(color=color, depth=cube_depth), mips, order,
                    swap_sorted)
        return CubeMaps(color=color, depth=cube_depth), mips, order
    return CubeMaps(color=color, depth=cube_depth), mips
