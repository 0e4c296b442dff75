"""Order-3 spherical harmonics: cube-map projection + irradiance evaluation.

TPU-rebuild of the reference's SH chain:

- Projection (`XUSG/Advanced/XUSGSphericalHarmonics.h:19-99`, shipped only
  as `Bin/CSSH{CubeMap,Sum,Normalize}.cso` binaries): per-texel SH-9 basis x
  radiance x solid-angle weight, tree-reduced over all 6 faces, then
  normalized by total weight. Here this is one `jnp` weighted reduction —
  XLA tree-reduces it; no ping-pong buffers (`XUSGSphericalHarmonics.h:111`)
  are needed.
- Irradiance evaluation (`XUSG/Shaders/SHIrradianceTypeless.hlsli:16-37`):
  the Ramamoorthi-Hanrahan 9-coefficient cosine-lobe formula. The reference
  negates x/y in both projection and evaluation (a cube-map axis
  convention); those flips cancel through the projection-evaluation
  composition, so we use standard basis signs on both sides — the composed
  irradiance operator is identical.

Coefficient order (matching `shCoeffs[0..8]`):
L00, L1-1(y), L10(z), L11(x), L2-2(xy), L2-1(yz), L20, L21(xz), L22.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

SH_NUM_COEFF = 9


def sh_basis(d):
    """Real SH basis of order 3 evaluated at directions d: (..., 3) -> (..., 9)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack(
        [
            jnp.full_like(x, 0.28209479177387814),  # Y00
            0.4886025119029199 * y,                 # Y1-1
            0.4886025119029199 * z,                 # Y10
            0.4886025119029199 * x,                 # Y11
            1.0925484305920792 * x * y,             # Y2-2
            1.0925484305920792 * y * z,             # Y2-1
            0.31539156525252005 * (3.0 * z * z - 1.0),  # Y20
            1.0925484305920792 * x * z,             # Y21
            0.5462742152960396 * (x * x - y * y),   # Y22
        ],
        axis=-1,
    )


def cube_face_dirs(size: int) -> np.ndarray:
    """Unit directions for every texel of a 6-face cube map: (6, S, S, 3).

    D3D cube-map face order +X,-X,+Y,-Y,+Z,-Z with v pointing down, matching
    the interior-face layout in `CSRayMarch.hlsl:28-53` (GetLocalPos).
    """
    ts = (np.arange(size, dtype=np.float32) + 0.5) / size * 2.0 - 1.0
    u, v = np.meshgrid(ts, ts, indexing="xy")  # u right, v down in texture
    mv = -v
    one = np.ones_like(u)
    faces = np.stack(
        [
            np.stack([one, mv, -u], -1),    # +X
            np.stack([-one, mv, u], -1),    # -X
            np.stack([u, one, v], -1),      # +Y
            np.stack([u, -one, -v], -1),    # -Y
            np.stack([u, mv, one], -1),     # +Z
            np.stack([-u, mv, -one], -1),   # -Z
        ]
    )
    return faces / np.linalg.norm(faces, axis=-1, keepdims=True)


def cube_texel_solid_angles(size: int) -> np.ndarray:
    """Per-texel solid-angle weights for one face: (S, S). Same for all faces."""
    ts = (np.arange(size, dtype=np.float32) + 0.5) / size * 2.0 - 1.0
    u, v = np.meshgrid(ts, ts, indexing="xy")
    r2 = 1.0 + u * u + v * v
    da = (2.0 / size) ** 2
    return (da / (r2 * np.sqrt(r2))).astype(np.float32)


def project_cube_map(radiance):
    """Project a radiance cube map onto SH-9: (6, S, S, 3) -> (9, 3).

    Equivalent to the SH_CUBE_MAP -> SH_SUM -> SH_NORMALIZE dispatch chain
    (`XUSG/Advanced/XUSGSphericalHarmonics.h:59-99`) as one fused reduction.
    """
    size = radiance.shape[1]
    dirs = jnp.asarray(cube_face_dirs(size))                 # (6,S,S,3)
    w = jnp.asarray(cube_texel_solid_angles(size))           # (S,S)
    basis = sh_basis(dirs)                                   # (6,S,S,9)
    wb = basis * w[None, :, :, None]                         # weighted basis
    coeffs = jnp.einsum("fuvk,fuvc->kc", wb, radiance.astype(jnp.float32))
    total_w = 6.0 * jnp.sum(w)
    return coeffs * (4.0 * jnp.pi / total_w)


def eval_irradiance(sh_coeffs, n):
    """Cosine-convolved irradiance at normals n: (9,3),(...,3) -> (...,3).

    Formula from `SHIrradianceTypeless.hlsli:16-33` (standard basis signs;
    see module docstring). Includes the max(0, .) clamp.
    """
    c1 = 0.429043
    c2 = 0.511664
    c3 = 0.247708
    c4 = 0.886227
    x, y, z = n[..., 0:1], n[..., 1:2], n[..., 2:3]
    L = sh_coeffs
    irr = (
        (c1 * (x * x - y * y)) * L[8]
        + (c3 * (3.0 * z * z - 1.0)) * L[6]
        + c4 * L[0]
        + 2.0 * c1 * (L[4] * x * y + L[7] * x * z + L[5] * y * z)
        + 2.0 * c2 * (L[3] * x + L[1] * y + L[2] * z)
    )
    return jnp.maximum(irr, 0.0)


def eval_irradiance_soa(sh_coeffs, x, y, z):
    """`eval_irradiance` over scalar direction fields -> (r, g, b).

    SoA form for screen-space consumers: a trailing 3-channel dim would
    lane-pad 42x on TPU (the repo-wide layout rule)."""
    c1 = 0.429043
    c2 = 0.511664
    c3 = 0.247708
    c4 = 0.886227
    L = sh_coeffs
    outs = []
    for ch in range(3):
        irr = (
            (c1 * (x * x - y * y)) * L[8, ch]
            + (c3 * (3.0 * z * z - 1.0)) * L[6, ch]
            + c4 * L[0, ch]
            + 2.0 * c1 * (L[4, ch] * x * y + L[7, ch] * x * z
                          + L[5, ch] * y * z)
            + 2.0 * c2 * (L[3, ch] * x + L[1, ch] * y + L[2, ch] * z)
        )
        outs.append(jnp.maximum(irr, 0.0))
    return tuple(outs)


def eval_radiance_soa(sh_coeffs, x, y, z):
    """`eval_radiance` over scalar direction fields -> (r, g, b)."""
    ys = (
        jnp.full_like(x, 0.28209479177387814),
        0.4886025119029199 * y,
        0.4886025119029199 * z,
        0.4886025119029199 * x,
        1.0925484305920792 * x * y,
        1.0925484305920792 * y * z,
        0.31539156525252005 * (3.0 * z * z - 1.0),
        1.0925484305920792 * x * z,
        0.5462742152960396 * (x * x - y * y),
    )
    outs = []
    for ch in range(3):
        acc = ys[0] * sh_coeffs[0, ch]
        for k in range(1, 9):
            acc = acc + ys[k] * sh_coeffs[k, ch]
        outs.append(jnp.maximum(acc, 0.0))
    return tuple(outs)


def eval_radiance(sh_coeffs, d):
    """Band-limited radiance reconstruction at directions d:
    (9,3),(...,3) -> (...,3) — the raw SH expansion sum_k c_k Y_k(d),
    no cosine convolution.

    Stands in for rough specular environment lookups (the reference
    samples the radiance cube per pixel, `PSBasePass.hlsl:120-127`; at
    the shipped roughness 0.4 the Karis-weighted reflection is already
    low-frequency, and an order-3 reconstruction of the smooth sky probe
    is visually equivalent at zero gathers — deviation pinned by the
    mesh golden)."""
    basis = sh_basis(d)                                      # (..., 9)
    rad = jnp.einsum("...k,kc->...c", basis,
                     sh_coeffs.astype(jnp.float32))
    return jnp.maximum(rad, 0.0)


def average_luma(sh_coeffs):
    """`avgLum` from the reference eval: dot(L00, (0.25, 0.5, 0.25))."""
    return jnp.dot(sh_coeffs[0], jnp.array([0.25, 0.5, 0.25], jnp.float32))
