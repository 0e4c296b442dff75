"""Halton low-discrepancy sequence for TAA sub-pixel jitter.

TPU-rebuild of the `XUSG::Halton`/`IncrementalHalton` utilities
(`XUSG/Advanced/XUSGHalton.h:8-13`) consumed by
`ObjectRenderer::UpdateFrame` (`Content/ObjectRenderer.cpp:192-197`):
jitter = (halton2(i), halton3(i)) * 2 - 1, divided by the viewport.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def halton(index: int, base: int) -> float:
    """Radical inverse of `index` in `base` (host-side scalar)."""
    f, r = 1.0, 0.0
    i = int(index)
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


def halton23(index: int) -> tuple[float, float]:
    return halton(index, 2), halton(index, 3)


def halton_jitter(frame_idx, viewport_w: float, viewport_h: float):
    """Per-frame projection-space jitter, traced-index version.

    Matches `(halton*2-1)/viewport` (`ObjectRenderer.cpp:192-197`). Uses a
    precomputed period-64 table so `frame_idx` may be a traced scalar.
    """
    table = _halton_table(64)
    idx = jnp.asarray(frame_idx, jnp.int32) % table.shape[0]
    h = jnp.asarray(table)[idx]
    scale = jnp.array([1.0 / viewport_w, 1.0 / viewport_h], jnp.float32)
    return (h * 2.0 - 1.0) * scale


def _halton_table(n: int) -> np.ndarray:
    # index starts at 1: IncrementalHalton advances before first use
    return np.array([halton23(i + 1) for i in range(n)], np.float32)
