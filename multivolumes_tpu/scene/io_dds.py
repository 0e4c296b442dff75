"""DDS texture import.

Behavioral port of `XUSG::DDS::Loader` (`XUSG/Advanced/XUSGDDSLoader.h:
21-38`) for the formats the reference actually loads: R32_FLOAT 3D density
volumes (`MultiRayCaster::LoadVolumeData`, `MultiRayCaster.cpp:168-209`)
and RGBA16F/RGBA32F cube maps (`LightProbe::Init` radiance environment).
Returns numpy arrays; conversion to engine layout happens in
`scene.volume.r32f_to_rgba` exactly as the reference's `CSR32FToRGBA16F`
dispatch does.

Pure Python struct parsing (the ~100 bytes of header); bulk pixel data is
reinterpreted with numpy. A C++ fast path for very large volumes lives in
`multivolumes_tpu/native`.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np

DDS_MAGIC = 0x20534444  # 'DDS '

# dwFlags
DDSD_DEPTH = 0x800000
# dwCaps2
DDSCAPS2_CUBEMAP = 0x200
DDSCAPS2_VOLUME = 0x200000

# DXGI formats we support
DXGI_R32_FLOAT = 41
DXGI_R16G16B16A16_FLOAT = 10
DXGI_R32G32B32A32_FLOAT = 2
DXGI_R8G8B8A8_UNORM = 28
DXGI_B8G8R8A8_UNORM = 87
DXGI_R16_FLOAT = 54

_DTYPES = {
    DXGI_R32_FLOAT: (np.float32, 1),
    DXGI_R16_FLOAT: (np.float16, 1),
    DXGI_R16G16B16A16_FLOAT: (np.float16, 4),
    DXGI_R32G32B32A32_FLOAT: (np.float32, 4),
    DXGI_R8G8B8A8_UNORM: (np.uint8, 4),
    DXGI_B8G8R8A8_UNORM: (np.uint8, 4),
}


class DDSTexture(NamedTuple):
    data: np.ndarray        # volume: (D, H, W, C); cube: (6, H, W, C); 2D: (H, W, C)
    is_cube: bool
    is_volume: bool
    dxgi_format: int
    mip_count: int          # only mip 0 is returned in `data`


def _fourcc(code: bytes) -> int:
    return struct.unpack("<I", code)[0]


def load_dds(path: str) -> DDSTexture:
    with open(path, "rb") as f:
        raw = f.read()
    return parse_dds(raw)


def parse_dds(raw: bytes) -> DDSTexture:
    if len(raw) < 128 or struct.unpack("<I", raw[:4])[0] != DDS_MAGIC:
        raise ValueError("not a DDS file")

    (size, flags, height, width, _pitch, depth, mip_count) = struct.unpack(
        "<7I", raw[4:32]
    )
    if size != 124:
        raise ValueError("bad DDS header size")
    mip_count = max(mip_count, 1)

    pf_flags, pf_fourcc = struct.unpack("<2I", raw[80:88])
    pf_rgb_bit_count, r_mask, g_mask, b_mask, a_mask = struct.unpack(
        "<5I", raw[88:108]
    )
    caps2 = struct.unpack("<I", raw[112:116])[0]

    offset = 128
    dxgi = None
    array_size = 1
    if pf_flags & 0x4 and pf_fourcc == _fourcc(b"DX10"):
        dxgi, _dim, misc, array_size, _misc2 = struct.unpack(
            "<5I", raw[128:148]
        )
        offset = 148
        is_cube = bool(misc & 0x4)
    else:
        is_cube = bool(caps2 & DDSCAPS2_CUBEMAP)
        # legacy FourCC / masked formats
        if pf_flags & 0x4:
            legacy = {
                114: DXGI_R32_FLOAT,        # D3DFMT_R32F
                113: DXGI_R16G16B16A16_FLOAT,  # D3DFMT_A16B16G16R16F
                116: DXGI_R32G32B32A32_FLOAT,  # D3DFMT_A32B32G32R32F
                111: DXGI_R16_FLOAT,        # D3DFMT_R16F
            }.get(pf_fourcc)
            if legacy is None:
                raise ValueError(f"unsupported DDS FourCC {pf_fourcc:#x}")
            dxgi = legacy
        elif pf_flags & 0x40 and pf_rgb_bit_count == 32:
            dxgi = (
                DXGI_R8G8B8A8_UNORM if r_mask == 0xFF else DXGI_B8G8R8A8_UNORM
            )
        else:
            raise ValueError("unsupported legacy DDS pixel format")

    if dxgi not in _DTYPES:
        raise ValueError(f"unsupported DXGI format {dxgi}")
    dtype, channels = _DTYPES[dxgi]
    texel = np.dtype(dtype).itemsize * channels

    is_volume = bool(flags & DDSD_DEPTH) or bool(caps2 & DDSCAPS2_VOLUME)
    depth = depth if is_volume else 1
    faces = 6 if is_cube else 1

    def mip_bytes(w, h, d):
        return max(w, 1) * max(h, 1) * max(d, 1) * texel

    # Per face/array element, mips are stored consecutively.
    out_faces = []
    pos = offset
    for _face in range(faces):
        w, h, d = width, height, depth
        face0 = None
        for m in range(mip_count):
            nbytes = mip_bytes(w, h, d)
            if m == 0:
                buf = np.frombuffer(raw, dtype=dtype, count=nbytes // np.dtype(dtype).itemsize, offset=pos)
                if is_volume:
                    face0 = buf.reshape(max(d, 1), max(h, 1), max(w, 1), channels)
                else:
                    face0 = buf.reshape(max(h, 1), max(w, 1), channels)
            pos += nbytes
            w, h, d = max(w // 2, 1), max(h // 2, 1), max(d // 2, 1)
        out_faces.append(face0)

    if is_cube:
        data = np.stack(out_faces)
        if dxgi == DXGI_B8G8R8A8_UNORM:
            data = data[..., [2, 1, 0, 3]]
        return DDSTexture(data, True, False, dxgi, mip_count)
    data = out_faces[0]
    if dxgi == DXGI_B8G8R8A8_UNORM:
        data = data[..., [2, 1, 0, 3]]
    return DDSTexture(data, False, is_volume, dxgi, mip_count)


def write_dds_r32f_volume(path: str, volume: np.ndarray) -> None:
    """Write a (D, H, W) float32 density grid as an R32F volume DDS —
    useful for round-trip tests and exporting procedural volumes."""
    volume = np.ascontiguousarray(volume, np.float32)
    d, h, w = volume.shape
    header = bytearray(128)
    struct.pack_into("<I", header, 0, DDS_MAGIC)
    # size, flags (CAPS|HEIGHT|WIDTH|PIXELFORMAT|DEPTH|LINEARSIZE)
    struct.pack_into("<7I", header, 4, 124,
                     0x1 | 0x2 | 0x4 | 0x1000 | DDSD_DEPTH | 0x80000,
                     h, w, w * 4, d, 1)
    # pixel format: size 32, flags FOURCC, fourcc D3DFMT_R32F (114)
    struct.pack_into("<II", header, 76, 32, 0x4)
    struct.pack_into("<I", header, 84, 114)
    struct.pack_into("<I", header, 108, 0x1000 | 0x8)  # caps: TEXTURE|COMPLEX
    struct.pack_into("<I", header, 112, DDSCAPS2_VOLUME)
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(volume.tobytes())
