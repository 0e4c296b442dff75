"""Wavefront OBJ import.

Behavioral port of `XUSG::ObjLoader` (`XUSG/Optional/XUSGObjLoader.cpp`):
two-pass parse (count, then fill), per-vertex normals accumulated from face
normals when the file has none, AABB computation. Used for the opaque-mesh
subsystem (`ObjectRenderer::Init`, `Content/ObjectRenderer.cpp:68-77`).

numpy implementation; a C++ fast path lives in `multivolumes_tpu/native`
(same output contract) for large meshes.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Mesh(NamedTuple):
    vertices: np.ndarray  # (V, 6) position + normal, float32
    indices: np.ndarray   # (T, 3) int32
    aabb_min: np.ndarray  # (3,)
    aabb_max: np.ndarray  # (3,)

    @property
    def scene_size(self) -> float:
        """max extent — `ObjectRenderer.cpp:76` uses this * posScale.w."""
        return float(np.max(self.aabb_max - self.aabb_min))


def load_obj(path: str, for_dx: bool = True) -> Mesh:
    """for_dx mirrors the loader's handedness conversion
    (`XUSGObjLoader.cpp:198,227`): negate z and flip triangle winding
    (OBJ right-handed -> engine left-handed)."""
    positions: list[list[float]] = []
    faces: list[list[int]] = []
    normals_file: list[list[float]] = []
    nidx: list[list[int]] = []

    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                positions.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("vn "):
                parts = line.split()
                normals_file.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                parts = line.split()[1:]
                # triangulate fans; indices may be v, v/t, v//n, v/t/n
                vs, ns = [], []
                for p in parts:
                    comp = p.split("/")
                    vs.append(int(comp[0]))
                    if len(comp) == 3 and comp[2]:
                        ns.append(int(comp[2]))
                for k in range(1, len(vs) - 1):
                    faces.append([vs[0], vs[k], vs[k + 1]])
                    if ns:
                        nidx.append([ns[0], ns[k], ns[k + 1]])

    pos = np.asarray(positions, np.float32)
    v_count = pos.shape[0]
    idx = np.asarray(faces, np.int64)
    idx = np.where(idx > 0, idx - 1, v_count + idx).astype(np.int32)
    if for_dx:
        pos[:, 2] = -pos[:, 2]
        idx = idx[:, [0, 2, 1]].copy()  # flip winding
        if normals_file:
            for nf in normals_file:
                nf[2] = -nf[2]

    if normals_file and len(nidx) == len(faces):
        nrm_src = np.asarray(normals_file, np.float32)
        nix = np.asarray(nidx, np.int64)
        nix = np.where(nix > 0, nix - 1, len(normals_file) + nix).astype(np.int32)
        # average the file normals onto vertices (the loader's needNorm path
        # recomputes when absent; when present it uses them per vertex)
        nrm = np.zeros((v_count, 3), np.float32)
        np.add.at(nrm, idx.reshape(-1), nrm_src[nix.reshape(-1)])
    else:
        nrm = _accumulate_normals(pos, idx)

    nl = np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / np.maximum(nl, 1e-20)

    verts = np.concatenate([pos, nrm], -1).astype(np.float32)
    return Mesh(
        vertices=verts,
        indices=idx,
        aabb_min=pos.min(0),
        aabb_max=pos.max(0),
    )


def _accumulate_normals(pos: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Area-weighted face-normal accumulation
    (`ObjLoader::computePerVertexNormals`)."""
    p0, p1, p2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
    fn = np.cross(p1 - p0, p2 - p0)  # area-weighted
    nrm = np.zeros_like(pos)
    for k in range(3):
        np.add.at(nrm, idx[:, k], fn)
    return nrm
