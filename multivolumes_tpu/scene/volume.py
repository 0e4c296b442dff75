"""Density-volume creation and import conversion.

Ports the behavior of the two volume-init kernels:

- `init_grid_data`: procedural sphere-falloff test volume
  (`Content/Shaders/CSInitGridData.hlsl:10-27`) — the data path actually
  exercised by the demo configs here, since the reference's DDS volume
  assets are large-blob-stripped in the snapshot.
- `r32f_to_rgba`: DDS import conversion R32F density -> RGBA density with
  white albedo and alpha = density * 0.25
  (`Content/Shaders/CSR32FToRGBA16F.hlsl:16-26`).

Volumes are (D, H, W, 4) arrays, RGB = albedo, A = density, value layout
matching `RGBA16F` (we keep fp32 or bf16 — TPU has no fp16 compute).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def init_grid_data(grid_size: int, dtype=jnp.float32,
                   corner_free: bool = False) -> jnp.ndarray:
    """Procedural test volume: (1-r^2)^4 * 2 falloff, orange/blue gradient.

    Port of `CSInitGridData.hlsl:10-27`; DTid maps to [z, y, x] here with
    pos = (idx + 0.5)/N * 2 - 1 per axis.

    Note the reference formula `saturate((1-r^2)^4 * 2)` re-saturates to
    density 1 in the cube corners (r^2 > 2), so the literal volume is a
    sphere blob plus eight dense corner bulbs. `corner_free=True` clamps
    (1-r^2) at zero first, producing the pure blob — nicer demo visuals
    (the reference demo normally loads DDS volumes and rarely shows this).
    """
    ts = (np.arange(grid_size, dtype=np.float32) + 0.5) / grid_size * 2.0 - 1.0
    z, y, x = np.meshgrid(ts, ts, ts, indexing="ij")
    r_sq = x * x + y * y + z * z
    a = 1.0 - r_sq
    if corner_free:
        a = np.maximum(a, 0.0)
    a = a * a
    a = np.clip(a * a * 2.0, 0.0, 1.0)

    color_u = np.array([1.0, 0.6, 0.0], np.float32)
    color_d = np.array([0.5, 0.8, 1.0], np.float32)
    t = np.clip(y * 0.5 + 0.2, 0.0, 1.0)[..., None]
    color = color_d * (1.0 - t) + color_u * t

    vol = np.concatenate([color, a[..., None]], axis=-1).astype(np.float32)
    return jnp.asarray(vol, dtype=dtype)


def init_grid_variant(grid_size: int, seed: int, dtype=jnp.float32) -> jnp.ndarray:
    """Procedural stand-ins for the stripped DDS volume sources.

    The reference cycles 10 distinct DDS density fields
    (`MultiVolumes.cpp:60-69`); the snapshot ships none of them, so we
    generate visually distinct blobby fields per source id: the base sphere
    falloff modulated by a few low-frequency cosine lobes.
    """
    ts = (np.arange(grid_size, dtype=np.float32) + 0.5) / grid_size * 2.0 - 1.0
    z, y, x = np.meshgrid(ts, ts, ts, indexing="ij")
    rng = np.random.RandomState(seed + 12345)
    a = 1.0 - (x * x + y * y + z * z)
    a = np.clip(a, 0.0, None) ** 2
    mod = np.ones_like(a)
    for _ in range(3):
        k = rng.uniform(1.5, 4.0, size=3)
        ph = rng.uniform(0, 2 * np.pi, size=3)
        mod *= 0.5 + 0.5 * np.cos(k[0] * np.pi * x + ph[0]) * np.cos(
            k[1] * np.pi * y + ph[1]
        ) * np.cos(k[2] * np.pi * z + ph[2])
    a = np.clip(a * (0.35 + 1.3 * mod) * 2.0, 0.0, 1.0)

    hue = rng.uniform(0, 1, size=3)
    color_u = 0.4 + 0.6 * np.roll(np.array([1.0, 0.6, 0.1], np.float32), seed % 3) * hue[0]
    color_d = 0.4 + 0.6 * np.roll(np.array([0.4, 0.7, 1.0], np.float32), seed % 3)
    t = np.clip(y * 0.5 + 0.2, 0.0, 1.0)[..., None]
    color = (color_d * (1.0 - t) + color_u * t).astype(np.float32)

    vol = np.concatenate([color, a[..., None]], axis=-1).astype(np.float32)
    return jnp.asarray(vol, dtype=dtype)


def r32f_to_rgba(density, dtype=jnp.float32) -> jnp.ndarray:
    """Convert an imported R32F density grid to the engine's RGBA layout.

    Port of `CSR32FToRGBA16F.hlsl:16-26`: white albedo, alpha = density/4.
    The reference also resamples to the engine grid size through a linear
    sampler; callers should resize first if shapes differ.
    """
    density = jnp.asarray(density, jnp.float32)
    rgb = jnp.ones(density.shape + (3,), jnp.float32)
    a = density[..., None] * 0.25
    return jnp.concatenate([rgb, a], axis=-1).astype(dtype)


def make_volume_sources(num_srcs: int, grid_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Stack of source density textures: (num_srcs, D, H, W, 4).

    Source 0 is the canonical CSInitGridData volume (used for golden
    tests); the rest are procedural variants standing in for the DDS set.
    """
    vols = [init_grid_data(grid_size, dtype, corner_free=True)]
    for i in range(1, num_srcs):
        vols.append(init_grid_variant(grid_size, i, dtype))
    return jnp.stack(vols)
