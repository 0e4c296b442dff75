"""Pallas kernels for the shear-warp light march (render/lightsweep.py).

The XLA formulation runs two `lax.scan`s of L (= light_grid_size) steps,
each step two (L, L) matmuls per cohort volume (the lateral shear
`B(x) = mv @ x @ mu^T`) plus elementwise work — at L = 96 the matmuls
are tiny, so the scans are launch/dispatch-bound (~2.5 ms/frame at the
demo config). Here each volume's whole march runs in one kernel
invocation with every operand VMEM-resident (the largest, the oriented
cohort density (L, L, L) f32, is ~3.5 MB):

  * `light_self_scan_pallas` — the volume-only transmittance scan with
    the per-slice mesh-shadow factor: emits here_k = B(s_k) * lit_k per
    slice and the outgoing footprint s_out = final carry.
  * `light_advect_mul_pallas` — advects the incoming occlusion t_in
    through the volume and multiplies with the stored here fields:
    out_k = here_k * B^{k+1}(t_in).

Both are exact restatements of the scans in
`lightsweep.light_transmittance` (same f32 accumulation; contraction
order differs by one associativity step — ~1e-6 drift, covered by the
lightsweep equality test).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multivolumes_tpu.config import SharedConsts
from multivolumes_tpu.ops.pallas import interpret_default

ABSORPTION = SharedConsts.ABSORPTION

# Whole-volume VMEM residency ((L, L, L) f32 in + out, double-buffered)
# totals ~18 MB at L = 96 — over Mosaic's 16 MB default scoped-vmem cap
# but well inside v5e's 128 MB VMEM. Raise the cap instead of blocking
# the slab axis: the march carries (s_c, sm_c, z_c) across every slab,
# so blocking would force a scratch-carried multi-block pipeline for a
# pass that is ~2.5 ms/frame total.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _bshift(x, mv_ref, mu_ref):
    """B(x) = mv @ x @ mu^T, f32 accumulation on the MXU.

    mv_ref/mu_ref are (1, L, L) block refs."""
    t1 = jax.lax.dot_general(
        x, mu_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        mv_ref[0], t1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _make_self_kernel(l: int, has_sm: bool):
    def kernel(flt_sc, rho_ref, mv_ref, mu_ref, sm_ref, z_ref,
               here_ref, sout_ref):
        cidx = pl.program_id(0)
        f_corr = flt_sc[cidx, 0]
        dz_slice = flt_sc[cidx, 1]
        soft = flt_sc[cidx, 2]

        def body(k, carry):
            s_c, sm_c, z_c = carry
            shifted = _bshift(s_c, mv_ref, mu_ref)
            if has_sm:
                sm_c = _bshift(sm_c, mv_ref, mu_ref)
                z_c = _bshift(z_c, mv_ref, mu_ref)
                zk = z_c + (k.astype(jnp.float32) + 0.5) * dz_slice
                lit = jnp.clip((sm_c - zk) / soft + 1.0, 0.0, 1.0)
                here = shifted * lit
            else:
                here = shifted
            here_ref[0, k] = here
            rho_k = rho_ref[0, k]
            atten = jnp.exp2(
                f_corr * jnp.log2(
                    jnp.maximum(1.0 - rho_k * ABSORPTION, 1e-7)))
            return (shifted * atten, sm_c, z_c)

        ones = jnp.ones((l, l), jnp.float32)
        init = (ones,
                sm_ref[0] if has_sm else ones,
                z_ref[0] if has_sm else ones)
        s_out, _sm, _z = jax.lax.fori_loop(0, l, body, init)
        sout_ref[0] = s_out

    return kernel


@functools.partial(jax.jit, static_argnames=("has_sm", "interpret"))
def light_self_scan_pallas(rho_o, mv_sub, mu_sub, sm_vol, z_entry,
                           f_corr_s, dz_slice, soft, has_sm: bool,
                           interpret: bool | None = None):
    """rho_o (C, L, L, L) w-major; mv/mu (C, L, L); sm_vol/z_entry
    (C, L, L) (ignored when not has_sm); scalars (C,).
    -> (here (C, L, L, L) w-major, s_out (C, L, L))."""
    if interpret is None:
        interpret = interpret_default()
    c, l = rho_o.shape[0], rho_o.shape[1]
    flt_sc = jnp.stack(
        [f_corr_s,
         dz_slice if has_sm else jnp.zeros_like(f_corr_s),
         soft if has_sm else jnp.ones_like(f_corr_s)], axis=1)

    blk3 = pl.BlockSpec((1, l, l), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk4 = pl.BlockSpec((1, l, l, l), lambda i, *_: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[blk4, blk3, blk3, blk3, blk3],
        out_specs=[blk4, blk3],
    )

    dummy = jnp.zeros((c, l, l), jnp.float32)
    here, sout = pl.pallas_call(
        _make_self_kernel(l, has_sm),
        out_shape=[
            jax.ShapeDtypeStruct((c, l, l, l), jnp.float32),
            jax.ShapeDtypeStruct((c, l, l), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(flt_sc,
      rho_o.astype(jnp.float32), mv_sub.astype(jnp.float32),
      mu_sub.astype(jnp.float32),
      (sm_vol if has_sm else dummy).astype(jnp.float32),
      (z_entry if has_sm else dummy).astype(jnp.float32))
    return here, sout


def _make_adv_kernel(l: int):
    def kernel(here_ref, tin_ref, mv_ref, mu_ref, out_ref):
        def body(k, t_c):
            t_c = _bshift(t_c, mv_ref, mu_ref)
            out_ref[0, k] = here_ref[0, k] * t_c
            return t_c

        jax.lax.fori_loop(0, l, body, tin_ref[0])

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def light_advect_mul_pallas(here, t_ins, mv_sub, mu_sub,
                            interpret: bool | None = None):
    """here (C, L, L, L) w-major; t_ins/mv/mu (C, L, L).
    -> t_fields (C, L, L, L) w-major: here_k * B^{k+1}(t_in)."""
    if interpret is None:
        interpret = interpret_default()
    c, l = here.shape[0], here.shape[1]
    blk3 = pl.BlockSpec((1, l, l), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk4 = pl.BlockSpec((1, l, l, l), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(c,),
        in_specs=[blk4, blk3, blk3, blk3],
        out_specs=blk4,
    )
    return pl.pallas_call(
        _make_adv_kernel(l),
        out_shape=jax.ShapeDtypeStruct((c, l, l, l), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(here.astype(jnp.float32), t_ins.astype(jnp.float32),
      mv_sub.astype(jnp.float32), mu_sub.astype(jnp.float32))
