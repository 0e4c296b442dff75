"""Pallas/Mosaic TPU kernels for the screen- and march-space hot loops.

Each kernel has a pure-jnp twin elsewhere in the tree (render/taa.py,
render/sweep.py, ...) that defines the semantics; tests compare the two.
Kernels run compiled on TPU and fall back to interpreter mode on CPU
(`interpret_default()`), so the suite stays hermetic on CPU hosts.
"""

from __future__ import annotations

import jax


def interpret_default() -> bool:
    """True when Pallas should run in interpreter mode (non-TPU backend)."""
    return jax.default_backend() != "tpu"
