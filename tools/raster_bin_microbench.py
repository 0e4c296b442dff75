"""Primitive-level microbench for a per-tile binned Pallas rasterizer.

VERDICT round-4 item 4: either break the mesh raster's scatter-min
floor (~3.07 ms traced at 334k samples, ~8 ns/serialized update) with a
per-tile binning rasterizer, or record WITH NUMBERS why binning loses.

A binned design for this workload (bunny at demo distance: ~34k
front-facing triangles, median bbox 2.7 px, inside a <=384 px window)
decomposes into three measurable primitives:

1. BIN SORT — argsort of one tile key per (triangle, covered-tile)
   entry (~75k entries at ~2.2 tiles/triangle on (8, 128) px tiles).
2. PLACEMENT GATHER — one 16-wide coefficient-row gather into
   chunk-padded, bucket-sorted order (~75-100k rows incl. padding).
3. EVAL KERNEL — a flat Pallas grid over 128-candidate chunks; each
   chunk evaluates 3 affine edge/z functions for its 128 candidates
   over its tile's (8, 128) pixels ((8, 128, 128) f32 temps), packs
   (z15 | tid17) into i32 and min-reduces over the candidate axis;
   revisited output tiles accumulate across consecutive chunks
   (scalar-prefetched tile ids, grouped-matmul pattern).

The scatter baseline the sum has to beat is re-measured in the same
process (334k-sample `.at[pix].min`, the production shape).

Run on TPU from the repo root:  python tools/raster_bin_microbench.py
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", type=int, default=75_000,
                    help="(triangle, tile) entries for sort/gather")
    ap.add_argument("--chunks", type=int, default=600,
                    help="128-candidate chunks for the eval kernel")
    ap.add_argument("--tiles", type=int, default=150,
                    help="distinct output tiles the chunks map onto")
    ap.add_argument("--samples", type=int, default=334_000,
                    help="scatter-min baseline sample count")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from multivolumes_tpu.utils.platform import configure_for_host

    configure_for_host()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from multivolumes_tpu.ops.pallas import interpret_default
    from multivolumes_tpu.utils.timing import readback_latency, sync

    lat = None

    def timed(name, fn, *a):
        nonlocal lat
        j = jax.jit(fn)
        out = j(*a)
        sync(out)
        if lat is None:
            lat = readback_latency()

        def run(n):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = j(*a)
            sync(r)
            return (time.perf_counter() - t0) * 1e3 - lat

        # escalate iterations until the batch dwarfs the tunnel-rtt
        # jitter (the bench.py rule): an 8-iteration batch of a
        # sub-ms primitive measures rtt noise, not the primitive
        # (gather read 0.6 and 9.3 ms across two 8-iter runs)
        n, total = args.iters, run(args.iters)
        while total < 8.0 * lat and n < 1024:
            n *= 4
            total = run(n)
        ms = max(total, 0.0) / n
        print(f"{name:34s} {ms:8.3f} ms   ({n} iters)")
        return ms

    rng = np.random.default_rng(0)
    n_e, n_c, n_t = args.entries, args.chunks, args.tiles

    # --- baseline: the production-shaped serialized scatter-min ---------
    pix = jnp.asarray(rng.integers(0, 800 * 1280, args.samples), jnp.int32)
    val = jnp.asarray(rng.integers(0, 1 << 31, args.samples), jnp.uint32)

    def scatter_min(p, v):
        buf = jnp.full((800 * 1280 + 1,), jnp.uint32(0xFFFFFFFF))
        return buf.at[p].min(v, mode="drop")

    t_scatter = timed(f"scatter_min {args.samples / 1e3:.0f}k", scatter_min,
                      pix, val)

    # --- primitive 1: bin sort ------------------------------------------
    keys = jnp.asarray(rng.integers(0, n_t, n_e), jnp.uint32)

    t_sort = timed(f"argsort {n_e / 1e3:.0f}k u32",
                   lambda k: jnp.argsort(k), keys)
    # the ladder's existing by-edge argsort would be REPLACED by a
    # sort_key that also carries the rank, so sort cost is incremental

    # --- primitive 2: placement row gather ------------------------------
    tbl = jnp.asarray(rng.standard_normal((n_e, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n_e, n_c * 128), jnp.int32)

    t_gather = timed(f"row gather {n_c * 128 / 1e3:.0f}k x16",
                     lambda t, i: t[i], tbl, idx)

    # --- primitive 3: the eval kernel ------------------------------------
    # coefficient table, chunk-major: (16, n_c * 128) f32
    # rows 0-8: c1x c1y c1k  c2x c2y c2k  zx zy zk ; row 9: tid
    coef = rng.standard_normal((16, n_c * 128)).astype(np.float32) * 0.01
    coef[9] = rng.integers(0, 1 << 17, n_c * 128)
    coef = jnp.asarray(coef)
    # chunks sorted by tile: consecutive chunks share an output tile
    tile_of_chunk = np.sort(rng.integers(0, n_t, n_c)).astype(np.int32)
    first = np.ones((n_c,), np.int32)
    first[1:] = tile_of_chunk[1:] != tile_of_chunk[:-1]
    x0 = (rng.integers(0, 3, n_c) * 128).astype(np.float32)
    y0 = (rng.integers(0, 48, n_c) * 8).astype(np.float32)

    def kern(tile_ref, first_ref, x0_ref, y0_ref, coef_ref, out_ref):
        i = pl.program_id(0)
        # integer iota + cast (Mosaic rejects f32 tpu.iota), full
        # (8, 128, 128) shape (minor-dim-1 vectors are a lowering hazard)
        xg = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 1) \
            .astype(jnp.float32) + x0_ref[i] + 0.5
        yg = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 0) \
            .astype(jnp.float32) + y0_ref[i] + 0.5
        c = coef_ref[...]                       # (16, 128)
        c1 = xg * c[0][None, None] + yg * c[1][None, None] + c[2][None, None]
        c2 = xg * c[3][None, None] + yg * c[4][None, None] + c[5][None, None]
        z = xg * c[6][None, None] + yg * c[7][None, None] + c[8][None, None]
        b0 = 1.0 - c1 - c2
        ok = (jnp.minimum(jnp.minimum(c1, c2), b0) >= 0.0) \
            & (z >= 0.0) & (z <= 1.0)
        zq = jnp.clip(z * 32767.0, 0, 32767).astype(jnp.int32)
        tid = c[9][None, None].astype(jnp.int32)
        packed = jnp.where(ok, (zq << 17) | tid, jnp.int32(0x7FFFFFFF))
        m = jnp.min(packed, axis=-1)            # (8, 128)

        @pl.when(first_ref[i] == 1)
        def _init():
            out_ref[...] = m

        @pl.when(first_ref[i] == 0)
        def _acc():
            out_ref[...] = jnp.minimum(out_ref[...], m)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_c,),
        in_specs=[pl.BlockSpec((16, 128), lambda i, *s: (0, i))],
        out_specs=pl.BlockSpec((8, 128), lambda i, t, f, x, y: (t[i], 0)),
    )
    evalk = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_t * 8, 128), jnp.int32),
        interpret=interpret_default(),
    )

    tile_j = jnp.asarray(tile_of_chunk)
    first_j = jnp.asarray(first)
    x0_j = jnp.asarray(x0)
    y0_j = jnp.asarray(y0)

    t_eval = timed(f"eval kernel {n_c} chunks",
                   lambda c_: evalk(tile_j, first_j, x0_j, y0_j, c_), coef)

    total = t_sort + t_gather + t_eval
    print(f"{'-' * 50}")
    print(f"binned total (sort+gather+eval)    {total:8.3f} ms"
          f"   vs scatter-min {t_scatter:.3f} ms"
          f"   ({'WINS' if total < t_scatter else 'LOSES'},"
          f" delta {t_scatter - total:+.3f} ms; emit/key prep and"
          f" per-tile count math not yet charged to either side)")


if __name__ == "__main__":
    main()
