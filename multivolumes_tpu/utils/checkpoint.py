"""Checkpoint / resume for the scene state.

The reference has none (SURVEY.md section 5: the closest artifact is the
F11 PNG dump; scenes are reconstructible only from CLI flags). Here the
whole `SceneState` is a pytree, so a checkpoint is a flat npz of its
leaves — runs are resumable and deterministic (TAA history and the frame
counter are part of the state).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from multivolumes_tpu.scene.state import SceneState

_FIELDS = [f.name for f in dataclasses.fields(SceneState)]


def save_scene(path: str, state: SceneState) -> None:
    arrays = {}
    bf16_fields = []
    for name in _FIELDS:
        a = np.asarray(getattr(state, name))
        if a.dtype.kind == "V":  # bfloat16 has no npz representation
            a = a.astype(np.float32)
            bf16_fields.append(name)
        arrays[name] = a
    arrays["__bf16_fields__"] = np.asarray(bf16_fields, dtype="U64")
    np.savez_compressed(path, **arrays)


def load_scene(path: str) -> SceneState:
    with np.load(path) as data:
        bf16 = set(data["__bf16_fields__"].tolist()) if "__bf16_fields__" in data else set()
        kwargs = {
            name: jax.numpy.asarray(
                data[name],
                dtype=jax.numpy.bfloat16 if name in bf16 else None,
            )
            for name in _FIELDS
        }
    return SceneState(**kwargs)
