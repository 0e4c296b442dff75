"""Pallas plane-sweep view-march kernel — the engine's hottest loop.

Semantics twin: `render/sweep.py::sweep_batched` (reference hot loop:
`CSRayMarch.hlsl:117-153`). One grid step per (volume, face); inside,
the march over K planes runs in blocks of P planes:

  HBM -> VMEM DMA of the contiguous slab window [z_start, z_start+SPAN)
  of the slab-major oriented volume (and light map), then per plane two
  MXU matmuls (slab x u-interp, v-interp x result) and the front-to-back
  compositing update, with the (transmittance, scatter) carry resident
  in VMEM for the whole face.

The XLA formulation materializes every (B, P, C, H, W) slab gather and
einsum operand through HBM (~100 GB of traffic at n=64); here a slab
slice is read once. Three skip levels drop dead work entirely:
  * face skip: culled/back faces (run flag) never DMA or compute;
  * block skip: the sweep parameter s is monotone in the plane index, so
    the planes inside the face's [s_min, s_max] ray interval form a
    contiguous block range [blk_lo, blk_hi] computed up front — blocks
    outside it never run;
  * early exit: once every ray's transmittance < 0.01 (the reference's
    termination test), remaining blocks skip their compute.

Slab DMAs are double-buffered: block k+1's volume+light windows start
before block k's compute (two VMEM slots, per-slot semaphores), so the
HBM traffic rides under the MXU work instead of serializing with it.
Within the live range the DMA chain is unconditional (early exit gates
compute only) — a dead block's slab copy is ~1 MB against ~1 ms of
compute, and an unconditional chain cannot leak an unwaited semaphore.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multivolumes_tpu.config import SharedConsts
from multivolumes_tpu.ops.pallas import interpret_default

ABSORPTION = SharedConsts.ABSORPTION
ZERO_THRESHOLD = SharedConsts.ZERO_THRESHOLD
MAX_DIST = SharedConsts.MAX_DIST
FLT_MAX = 3.402823466e38


def _make_kernel(num_planes, size, d, h, w, dl, hl, wl, p_block,
                 span_v, span_l, n_blocks, w_p=None, wl_p=None,
                 use_zmax=False):
    """Bind the static geometry; returns the kernel body."""

    def kernel(int_sc, flt_sc, *rest):
        if use_zmax:
            (zmax_sc, vol_hbm, light_hbm, s_in_ref, s_end_ref,
             f_corr_ref, out_ref, vol_scr, light_scr, transm_scr,
             scat_scr, state_smem, sem) = rest
        else:
            zmax_sc = None
            (vol_hbm, light_hbm, s_in_ref, s_end_ref,
             f_corr_ref, out_ref, vol_scr, light_scr, transm_scr,
             scat_scr, state_smem, sem) = rest
        b = pl.program_id(0)
        src = int_sc[b, 0]
        lm = int_sc[b, 1]
        run = int_sc[b, 2]

        eu = flt_sc[b, 0]
        ev = flt_sc[b, 1]
        ew = flt_sc[b, 2]
        ew_c = flt_sc[b, 3]
        delta = flt_sc[b, 4]
        inv_gz = flt_sc[b, 5]
        s_min_b = flt_sc[b, 6]
        s_max_b = flt_sc[b, 7]
        n_eff = flt_sc[b, 8]   # per-face effective texel count (<= size)
        zf = flt_sc[b, 9]      # face flip flags (FACE_FLIPS): z, v, u
        vf = flt_sc[b, 10]
        uf = flt_sc[b, 11]

        transm_scr[:] = jnp.ones((size, size), jnp.float32)
        scat_scr[:] = jnp.zeros((4, size, size), jnp.float32)
        state_smem[0] = 1.0  # running max transmittance (early-exit test)

        # face-frame texel centers (rows of the interp matrices)
        def fiota(shape, dim):
            # Mosaic iota must be integer-typed; cast after
            return jax.lax.broadcasted_iota(jnp.int32, shape, dim
                                            ).astype(jnp.float32)

        # texel centers at the face's EFFECTIVE resolution (adaptive LOD:
        # rows/cols >= n_eff are dead rays, masked via s_end = -inf)
        u_col = (fiota((size, 1), 0) + 0.5) / n_eff * 2.0 - 1.0
        v_col = -u_col
        tw = fiota((size, w_p or w), 1)
        th = fiota((size, h), 1)
        twl = fiota((size, wl_p or wl), 1)
        thl = fiota((size, hl), 1)

        s_in = s_in_ref[0]
        s_end = s_end_ref[0]
        f_corr = f_corr_ref[0]
        cdtype = vol_scr.dtype

        def w_of_k(kf):
            return ew_c + (kf + 0.5) * delta

        def s_of_k(kf):
            return (w_of_k(kf) - ew) * inv_gz

        def zc_of_w(wk, dd):
            zc = (wk * 0.5 + 0.5) * dd - 0.5
            # fold the face's z mirror into the slice coordinate
            return zc + zf * ((dd - 1.0) - 2.0 * zc)

        # Contiguous live block range: s_of_k is monotone non-decreasing
        # (delta >= 0, inv_gz > 0), so invert it at the face's ray
        # interval and widen by one block for the floor/ceil edges.
        # Degenerate faces (all rays dead: s_min=+inf / s_max=-inf)
        # produce an empty range.
        den_k = jnp.maximum(delta, 1e-20)
        kf_lo = (s_min_b / inv_gz + ew - ew_c) / den_k - 0.5
        kf_hi = (s_max_b / inv_gz + ew - ew_c) / den_k - 0.5
        kf_lo = jnp.clip(kf_lo, -1e9, 1e9)  # FLT_MAX/1e-20 overflows int32
        kf_hi = jnp.clip(kf_hi, -1e9, 1e9)
        blk_lo = jnp.clip(
            jnp.floor(kf_lo / p_block).astype(jnp.int32) - 1, 0,
            n_blocks - 1)
        blk_hi = jnp.clip(
            jnp.ceil(kf_hi / p_block).astype(jnp.int32) + 1, -1,
            n_blocks - 1)

        def slab_windows(blk):
            k0f = (blk * p_block).astype(jnp.float32)
            klf = k0f + (p_block - 1)
            # with a z-mirrored face the window walks downward, so
            # anchor at the block's smaller end
            zc0 = jnp.minimum(zc_of_w(w_of_k(k0f), d),
                              zc_of_w(w_of_k(klf), d))
            z_start = jnp.clip(
                jnp.floor(zc0).astype(jnp.int32), 0, d - span_v)
            zl0 = jnp.minimum(zc_of_w(w_of_k(k0f), dl),
                              zc_of_w(w_of_k(klf), dl))
            zl_start = jnp.clip(
                jnp.floor(zl0).astype(jnp.int32), 0, dl - span_l)
            return z_start, zl_start

        def slab_copies(blk, slot):
            z_start, zl_start = slab_windows(blk)
            cp_v = pltpu.make_async_copy(
                vol_hbm.at[src, pl.ds(z_start, span_v)],
                vol_scr.at[slot], sem.at[slot, 0])
            cp_l = pltpu.make_async_copy(
                light_hbm.at[lm, pl.ds(zl_start, span_l)],
                light_scr.at[slot], sem.at[slot, 1])
            return cp_v, cp_l

        def block_body(blk, _):
            slot = jax.lax.rem(blk - blk_lo, 2)

            # prefetch the next block's slabs into the other slot while
            # this block computes
            @pl.when(blk + 1 <= blk_hi)
            def _():
                cp_vn, cp_ln = slab_copies(blk + 1, 1 - slot)
                cp_vn.start()
                cp_ln.start()

            cp_v, cp_l = slab_copies(blk, slot)
            cp_v.wait()
            cp_l.wait()

            k0f = (blk * p_block).astype(jnp.float32)
            z_start, zl_start = slab_windows(blk)
            alive = state_smem[0] >= 0.01
            if zmax_sc is not None:
                # transparent-block skip: interpolation is convex, so a
                # slab window whose per-slice density max stays <=
                # ZERO_THRESHOLD can produce no live sample (the kernel's
                # live test requires rho > ZERO_THRESHOLD) — skipping its
                # compute is EXACT. The (N_src*3, D) table is static per
                # source (scene.state.slab_density_max).
                dmax = jnp.float32(0.0)
                for dz in range(span_v):
                    zi = jnp.minimum(z_start + dz, d - 1)
                    dmax = jnp.maximum(dmax, zmax_sc[src, zi])
                alive = alive & (dmax > ZERO_THRESHOLD)

            @pl.when(alive)
            def _():
                transm = transm_scr[:]
                sr = scat_scr[0]
                sg = scat_scr[1]
                sb = scat_scr[2]
                sa = scat_scr[3]

                for p in range(p_block):
                    kf = k0f + p
                    wk = w_of_k(kf)
                    sk = s_of_k(kf)

                    # z interpolation (scalar per plane)
                    # scalar plane math stays f32 (Mosaic has no scalar
                    # bf16 ALU); cast via (1, 1) vectors at the broadcast
                    def lerp_w(a0, a1, frac):
                        f1 = jnp.full((1, 1), frac, jnp.float32
                                      ).astype(cdtype)
                        f0 = jnp.full((1, 1), 1.0 - frac, jnp.float32
                                      ).astype(cdtype)
                        return a0 * f0 + a1 * f1

                    zc = zc_of_w(wk, d)
                    z0g = jnp.clip(jnp.floor(zc).astype(jnp.int32), 0, d - 1)
                    z1g = jnp.minimum(z0g + 1, d - 1)
                    fz = jnp.clip(zc - jnp.floor(zc), 0.0, 1.0)
                    slab = lerp_w(vol_scr[slot, z0g - z_start],
                                  vol_scr[slot, z1g - z_start],
                                  fz)                           # (4, H, W)

                    zcl = zc_of_w(wk, dl)
                    zl0g = jnp.clip(jnp.floor(zcl).astype(jnp.int32), 0,
                                    dl - 1)
                    zl1g = jnp.minimum(zl0g + 1, dl - 1)
                    fzl = jnp.clip(zcl - jnp.floor(zcl), 0.0, 1.0)
                    lslab = lerp_w(light_scr[slot, zl0g - zl_start],
                                   light_scr[slot, zl1g - zl_start],
                                   fzl)                          # (3, Hl, Wl)

                    # interp matrices: rows = texels, cols = source axis
                    pu = eu + sk * (u_col - eu)                 # (S, 1)
                    pv = ev + sk * (v_col - ev)
                    cu = jnp.clip((pu * 0.5 + 0.5) * w - 0.5, 0.0, w - 1.0)
                    cv = jnp.clip((pv * 0.5 + 0.5) * h - 0.5, 0.0, h - 1.0)
                    cu = cu + uf * ((w - 1.0) - 2.0 * cu)  # lateral mirrors
                    cv = cv + vf * ((h - 1.0) - 2.0 * cv)
                    wx = jnp.maximum(1.0 - jnp.abs(cu - tw), 0.0
                                     ).astype(cdtype)           # (S, W)
                    wy = jnp.maximum(1.0 - jnp.abs(cv - th), 0.0
                                     ).astype(cdtype)           # (S, H)
                    cul = jnp.clip((pu * 0.5 + 0.5) * wl - 0.5, 0.0, wl - 1.0)
                    cvl = jnp.clip((pv * 0.5 + 0.5) * hl - 0.5, 0.0, hl - 1.0)
                    cul = cul + uf * ((wl - 1.0) - 2.0 * cul)
                    cvl = cvl + vf * ((hl - 1.0) - 2.0 * cvl)
                    wxl = jnp.maximum(1.0 - jnp.abs(cul - twl), 0.0
                                      ).astype(cdtype)          # (S, Wl)
                    wyl = jnp.maximum(1.0 - jnp.abs(cvl - thl), 0.0
                                      ).astype(cdtype)          # (S, Hl)

                    # pass 1: contract W across all channels at once
                    a_mat = slab.reshape(4 * h, w_p or w)
                    t1 = jax.lax.dot_general(
                        a_mat, wx, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(4, h, size).astype(cdtype)
                    al_mat = lslab.reshape(3 * hl, wl_p or wl)
                    t1l = jax.lax.dot_general(
                        al_mat, wxl, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(3, hl, size).astype(cdtype)

                    # pass 2: contract H per channel
                    def p2(wm, tc):
                        return jax.lax.dot_general(
                            wm, tc, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

                    pr = p2(wy, t1[0])
                    pg = p2(wy, t1[1])
                    pb = p2(wy, t1[2])
                    rho = p2(wy, t1[3])
                    lr = p2(wyl, t1l[0])
                    lg = p2(wyl, t1l[1])
                    lb = p2(wyl, t1l[2])

                    rho = jnp.clip(rho, 0.0, 1.0)
                    live = ((rho > ZERO_THRESHOLD)
                            & (sk >= s_in) & (sk <= s_end))
                    a_mult = jnp.exp2(
                        f_corr * jnp.log2(
                            jnp.maximum(1.0 - rho * ABSORPTION, 1e-7)))
                    a_mult = jnp.where(live, a_mult, 1.0)
                    amt = jnp.where(live, transm * (1.0 - a_mult), 0.0)
                    sr = sr + pr * lr * amt
                    sg = sg + pg * lg * amt
                    sb = sb + pb * lb * amt
                    sa = sa + amt
                    transm = transm * a_mult

                transm_scr[:] = transm
                scat_scr[0] = sr
                scat_scr[1] = sg
                scat_scr[2] = sb
                scat_scr[3] = sa
                state_smem[0] = jnp.max(transm)

            return 0

        @pl.when((run != 0) & (blk_lo <= blk_hi))
        def _():
            cp_v0, cp_l0 = slab_copies(blk_lo, 0)
            cp_v0.start()
            cp_l0.start()
            jax.lax.fori_loop(blk_lo, blk_hi + 1, block_body, 0)

        out_ref[0] = scat_scr[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_planes", "size", "dtype", "interpret",
                     "light_w"),
)
def sweep_batched_pallas(
    volumes_oriented,   # (N_src, 3, D, 4, H, W) slab-major variants
    light_oriented,     # (N, 3, Dl, 3, Hl, Wl) slab-major variants
    vol_tex_ids,        # (N,)
    eye_faces,          # (N, 6, 3)
    params,             # SweepParams, fields (N, 6, S, S)
    smp_count,          # (N,)
    run_mask,           # (N, 6)
    num_planes: int,
    size: int,
    dtype=jnp.float32,
    interpret: bool | None = None,
    n_eff_b=None,        # (N,) per-volume effective resolution (<= size)
    light_ids=None,      # (N,) rows of light_oriented to use (default 0..N)
    light_w: int | None = None,   # true light u extent when the input is
                                  # already lane-padded (state carries it
                                  # padded; see sweep.pad_light_lanes)
    vol_zmax=None,       # (N_src, 3, D) per-slab density max — enables
                         # the kernel's exact transparent-block skip
):
    """Drop-in twin of `sweep.sweep_batched`: (N, 6, 4, S, S) scatter.

    With n_eff_b, each volume's map occupies the top-left n_eff^2 corner
    at texel centers (i + 0.5) / n_eff — the adaptive-LOD contract; rays
    outside a volume's corner must already be dead in params.active.

    With light_ids, light_oriented may hold MORE volumes than the batch:
    volume i reads light row light_ids[i]. The LOD buckets pass the full
    HBM-resident stack this way — the kernel DMAs only the slab windows
    it marches, where a host-side light_oriented[ids] gather copied the
    whole multi-GB stack through HBM every frame."""
    if interpret is None:
        interpret = interpret_default()
    n = vol_tex_ids.shape[0]
    n_light = light_oriented.shape[0]
    b = n * 6
    n_src, _, d, _, h, w = volumes_oriented.shape
    dl, hl, wl_s = (light_oriented.shape[2], light_oriented.shape[4],
                    light_oriented.shape[5])
    wl = light_w if light_w else wl_s   # TRUE u extent (coords clip here)

    eye_b = eye_faces.reshape(b, 3)
    eu, ev, ew = eye_b[:, 0], eye_b[:, 1], eye_b[:, 2]
    ew_c = jnp.clip(ew, -1.0, 1.0)
    delta = (1.0 - ew_c) / num_planes
    inv_gz = 1.0 / jnp.maximum(1.0 - ew, 1e-6)

    from multivolumes_tpu.render.sweep import FACE_FLIPS, FACE_VARIANT

    tex_b = jnp.repeat(vol_tex_ids.astype(jnp.int32), 6)
    var_b = jnp.tile(jnp.asarray(FACE_VARIANT, jnp.int32), n)
    src_idx = tex_b * 3 + var_b
    lm_base = (jnp.arange(n, dtype=jnp.int32) if light_ids is None
               else light_ids.astype(jnp.int32))
    lm_idx = jnp.repeat(lm_base, 6) * 3 + var_b
    flips = jnp.asarray(FACE_FLIPS, jnp.float32)           # (6, 3)
    zf_b = jnp.tile(flips[:, 0], n)
    vf_b = jnp.tile(flips[:, 1], n)
    uf_b = jnp.tile(flips[:, 2], n)

    s_in = params.s_in.reshape(b, size, size).astype(jnp.float32)
    ray_ok = params.active.reshape(b, size, size)
    # fold ray validity into the end bound: dead rays never go live
    s_end = jnp.where(
        ray_ok, params.s_end.reshape(b, size, size), -FLT_MAX
    ).astype(jnp.float32)
    ray_len = params.ray_len.reshape(b, size, size)

    step_scale = MAX_DIST / jnp.maximum(
        jnp.repeat(smp_count, 6).astype(jnp.float32), 1.0)
    ds = delta * inv_gz
    f_corr = ((ds[:, None, None] * ray_len) / step_scale[:, None, None]
              ).astype(jnp.float32)

    # per-face live s-interval for block skipping
    inf = jnp.float32(FLT_MAX)
    s_min_b = jnp.min(jnp.where(ray_ok, s_in, inf), axis=(1, 2))
    s_max_b = jnp.max(jnp.where(ray_ok, s_end, -inf), axis=(1, 2))

    run = run_mask.reshape(b).astype(jnp.int32)
    int_sc = jnp.stack([src_idx, lm_idx, run,
                        jnp.zeros_like(run)], axis=1)   # (B, 4)
    if n_eff_b is None:
        n_eff_f = jnp.full((b,), float(size), jnp.float32)
    else:
        n_eff_f = jnp.repeat(n_eff_b.astype(jnp.float32), 6)
    flt_sc = jnp.stack([eu, ev, ew, ew_c, delta, inv_gz,
                        s_min_b, s_max_b, n_eff_f,
                        zf_b, vf_b, uf_b], axis=1)           # (B, 12)

    # plane blocking: P planes per DMA window; the window spans
    # ceil((P-1) * D / K) + 2 slices (z advances <= D/K per plane)
    p_block = max(1, min(8, (8 * num_planes) // max(d, 1), num_planes))
    while num_planes % p_block:
        p_block -= 1
    n_blocks = num_planes // p_block
    span_v = min(d, int(math.ceil((p_block - 1) * d / num_planes)) + 2)
    span_l = min(dl, int(math.ceil((p_block - 1) * dl / num_planes)) + 2)

    vol_flat = volumes_oriented.reshape(n_src * 3, d, 4, h, w).astype(dtype)
    light_flat = light_oriented.reshape(
        n_light * 3, dl, 3, hl, wl_s).astype(dtype)

    # Mosaic HBM slices must be lane-aligned: pad the minor (u) axis to a
    # multiple of 128. Padded texels get zero tent weights (coords clip to
    # the true extent), so results are unaffected; XLA fuses the pad into
    # the producing orient copy.
    w_p = -(-w // 128) * 128
    wl_p = -(-wl // 128) * 128
    if w_p != w:
        vol_flat = jnp.pad(vol_flat,
                           ((0, 0), (0, 0), (0, 0), (0, 0), (0, w_p - w)))
    if wl_s == wl_p:
        pass  # caller carries the stack pre-padded (pad_light_lanes)
    elif wl_s == wl:
        light_flat = jnp.pad(light_flat,
                             ((0, 0), (0, 0), (0, 0), (0, 0), (0, wl_p - wl)))
    else:
        raise ValueError(
            f"light stack minor dim {wl_s} matches neither light_w={wl} "
            f"nor its lane pad {wl_p}")

    kernel = _make_kernel(num_planes, size, d, h, w, dl, hl, wl,
                          p_block, span_v, span_l, n_blocks,
                          w_p=w_p, wl_p=wl_p,
                          use_zmax=vol_zmax is not None)

    prefetch = [int_sc, flt_sc]
    if vol_zmax is not None:
        prefetch.append(
            vol_zmax.reshape(n_src * 3, d).astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # volumes (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # light maps (HBM)
            pl.BlockSpec((1, size, size), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # s_in
            pl.BlockSpec((1, size, size), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # s_end
            pl.BlockSpec((1, size, size), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # f_corr
        ],
        out_specs=pl.BlockSpec((1, 4, size, size), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, span_v, 4, h, w_p), dtype),     # two DMA slots
            pltpu.VMEM((2, span_l, 3, hl, wl_p), dtype),
            pltpu.VMEM((size, size), jnp.float32),
            pltpu.VMEM((4, size, size), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),               # per slot v/l
        ],
    )

    scatter = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 4, size, size), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*prefetch, vol_flat, light_flat, s_in, s_end, f_corr)
    return scatter.reshape(n, 6, 4, size, size)
