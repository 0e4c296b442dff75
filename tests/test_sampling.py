"""ops.trilinear vs brute-force numpy (D3D linear-clamp sampler semantics)."""

import numpy as np
import jax.numpy as jnp

from multivolumes_tpu.ops import trilinear


def np_sample_trilinear(vol, uvw):
    d, h, w = vol.shape[:3]
    out = np.zeros(uvw.shape[:-1] + (vol.shape[-1],), np.float32)
    flat = uvw.reshape(-1, 3)
    res = []
    for u, v, ww in flat:
        x = u * w - 0.5
        y = v * h - 0.5
        z = ww * d - 0.5
        x0, y0, z0 = int(np.floor(x)), int(np.floor(y)), int(np.floor(z))
        fx, fy, fz = x - x0, y - y0, z - z0
        acc = 0.0
        for dz, wz in ((0, 1 - fz), (1, fz)):
            for dy, wy in ((0, 1 - fy), (1, fy)):
                for dx, wx in ((0, 1 - fx), (1, fx)):
                    xi = min(max(x0 + dx, 0), w - 1)
                    yi = min(max(y0 + dy, 0), h - 1)
                    zi = min(max(z0 + dz, 0), d - 1)
                    acc = acc + wz * wy * wx * vol[zi, yi, xi]
        res.append(acc)
    return np.asarray(res, np.float32).reshape(out.shape)


def test_trilinear_matches_numpy():
    rng = np.random.RandomState(42)
    vol = rng.rand(6, 5, 7, 4).astype(np.float32)
    uvw = rng.rand(50, 3).astype(np.float32) * 1.4 - 0.2  # incl. out-of-range
    got = np.asarray(trilinear.sample_trilinear(jnp.asarray(vol), jnp.asarray(uvw)))
    want = np_sample_trilinear(vol, uvw)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_trilinear_at_texel_centers_is_exact():
    rng = np.random.RandomState(0)
    vol = rng.rand(4, 4, 4, 1).astype(np.float32)
    # texel center (1,2,3) -> uvw ((3+.5)/4, (2+.5)/4, (1+.5)/4)
    uvw = jnp.array([[3.5 / 4, 2.5 / 4, 1.5 / 4]])
    got = np.asarray(trilinear.sample_trilinear(jnp.asarray(vol), uvw))
    np.testing.assert_allclose(got[0], vol[1, 2, 3], atol=1e-6)


def test_bilinear_matches_trilinear_slice():
    rng = np.random.RandomState(1)
    tex = rng.rand(8, 9, 3).astype(np.float32)
    uv = rng.rand(20, 2).astype(np.float32)
    got = np.asarray(trilinear.sample_bilinear(jnp.asarray(tex), jnp.asarray(uv)))
    # treat as a 1-deep volume at w=0.5
    vol = tex[None]
    uvw = np.concatenate([uv, np.full((20, 1), 0.5, np.float32)], -1)
    want = np_sample_trilinear(vol, uvw)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gather4_weights_reconstruct_bilinear():
    rng = np.random.RandomState(2)
    tex = rng.rand(8, 8).astype(np.float32)
    uv = rng.rand(10, 2).astype(np.float32) * 0.8 + 0.1
    g = np.asarray(trilinear.gather4_bilinear(jnp.asarray(tex), jnp.asarray(uv)))
    # domain = frac(uv*size + 0.5) as in PSCube.hlsli:34
    d = np.modf(uv * 8 + 0.5)[0]
    wb = np.stack(
        [(1 - d[:, 0]) * d[:, 1], d[:, 0] * d[:, 1],
         d[:, 0] * (1 - d[:, 1]), (1 - d[:, 0]) * (1 - d[:, 1])], -1
    )
    recon = (g * wb).sum(-1)
    want = np.asarray(trilinear.sample_bilinear(jnp.asarray(tex), jnp.asarray(uv)))
    np.testing.assert_allclose(recon, want, atol=1e-5)
