"""DirectXMath-convention 3D math on JAX arrays.

The reference app builds every transform with DirectXMath (left-handed,
row-vector times matrix, clip z in [0, 1]) and the HLSL consumes them as
`mul(p, M)` — see `MultiRayCaster::UpdateFrame`
(`Content/MultiRayCaster.cpp:316-353`). We keep the same convention so the
culling/LOD/marching geometry ports verbatim and stays testable against the
reference semantics: transform a point with `transform_point(p, M)` ==
HLSL `mul(float4(p, 1), M)`.

All functions are jit-safe and batch along leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def look_at_lh(eye, focus, up):
    """XMMatrixLookAtLH equivalent: row-vector view matrix."""
    eye = jnp.asarray(eye, jnp.float32)
    focus = jnp.asarray(focus, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    z = _normalize(focus - eye)
    x = _normalize(jnp.cross(up, z))
    y = jnp.cross(z, x)
    t = jnp.stack([-jnp.dot(x, eye), -jnp.dot(y, eye), -jnp.dot(z, eye)])
    m = jnp.stack(
        [
            jnp.array([x[0], y[0], z[0], 0.0], jnp.float32),
            jnp.array([x[1], y[1], z[1], 0.0], jnp.float32),
            jnp.array([x[2], y[2], z[2], 0.0], jnp.float32),
            jnp.concatenate([t, jnp.ones((1,), jnp.float32)]),
        ]
    )
    return m


def perspective_fov_lh(fov_y: float, aspect: float, z_near: float, z_far: float):
    """XMMatrixPerspectiveFovLH equivalent (clip z in [0,1])."""
    h = 1.0 / jnp.tan(jnp.asarray(fov_y, jnp.float32) * 0.5)
    w = h / aspect
    q = z_far / (z_far - z_near)
    return jnp.array(
        [
            [w, 0.0, 0.0, 0.0],
            [0.0, h, 0.0, 0.0],
            [0.0, 0.0, q, 1.0],
            [0.0, 0.0, -q * z_near, 0.0],
        ],
        jnp.float32,
    )


def orthographic_lh(width: float, height: float, z_near: float, z_far: float):
    """XMMatrixOrthographicLH equivalent."""
    q = 1.0 / (z_far - z_near)
    return jnp.array(
        [
            [2.0 / width, 0.0, 0.0, 0.0],
            [0.0, 2.0 / height, 0.0, 0.0],
            [0.0, 0.0, q, 0.0],
            [0.0, 0.0, -q * z_near, 1.0],
        ],
        jnp.float32,
    )


def scaling(s):
    s = jnp.broadcast_to(jnp.asarray(s, jnp.float32), (3,))
    return jnp.diag(jnp.concatenate([s, jnp.ones((1,), jnp.float32)]))


def translation(t):
    t = jnp.asarray(t, jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[3, :3].set(t)


def rotation_y(angle):
    c = jnp.cos(jnp.asarray(angle, jnp.float32))
    s = jnp.sin(jnp.asarray(angle, jnp.float32))
    return jnp.array(
        [
            [c, 0.0, -s, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [s, 0.0, c, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )


def transform_point(p, m):
    """HLSL `mul(float4(p, 1), M)` -> homogeneous float4.

    p: (..., 3), m: (..., 4, 4) -> (..., 4).
    """
    p = jnp.asarray(p)
    ph = jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)], axis=-1)
    return _rowvec_mul(ph, m)


def transform_point3(p, m):
    """Affine transform, ignoring projection: `mul(float4(p,1), (float4x3)M)`."""
    return transform_point(p, m)[..., :3]


def transform_vector(v, m):
    """HLSL `mul(v, (float3x3)M)` — rotate/scale only, no translation."""
    v = jnp.asarray(v)
    return jnp.einsum("...i,...ij->...j", v, m[..., :3, :3])


def project_point(p, m):
    """Transform + perspective divide -> (..., 3) NDC xyz."""
    h = transform_point(p, m)
    return h[..., :3] / h[..., 3:4]


def inverse(m):
    return jnp.linalg.inv(m)


def _rowvec_mul(ph, m):
    return jnp.einsum("...i,...ij->...j", ph, m)


def _normalize(v, eps: float = 1e-20):
    return v * jnp.reciprocal(jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), eps)))


def normalize(v, eps: float = 1e-20):
    """Safe vector normalize along the last axis."""
    return _normalize(jnp.asarray(v), eps)
