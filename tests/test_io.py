"""DDS round-trip + OBJ parsing."""

import numpy as np

from multivolumes_tpu.scene import io_dds, io_obj


def test_dds_r32f_volume_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    vol = rng.rand(8, 6, 4).astype(np.float32)
    path = str(tmp_path / "vol.dds")
    io_dds.write_dds_r32f_volume(path, vol)
    tex = io_dds.load_dds(path)
    assert tex.is_volume and not tex.is_cube
    assert tex.data.shape == (8, 6, 4, 1)
    np.testing.assert_array_equal(tex.data[..., 0], vol)


def test_obj_loader(tmp_path):
    obj = """
v 0 0 0
v 1 0 0
v 0 1 0
v 0 0 1
f 1 2 3
f 1 4 2
f 2 4 3
f 1 3 4
"""
    path = tmp_path / "tet.obj"
    path.write_text(obj)
    mesh = io_obj.load_obj(str(path), for_dx=False)
    assert mesh.vertices.shape == (4, 6)
    assert mesh.indices.shape == (4, 3)
    np.testing.assert_allclose(mesh.aabb_min, [0, 0, 0])
    np.testing.assert_allclose(mesh.aabb_max, [1, 1, 1])
    # forDX conversion (XUSGObjLoader.cpp:198,227): z negated, winding flip
    mesh_dx = io_obj.load_obj(str(path))
    np.testing.assert_allclose(mesh_dx.vertices[:, 2], -mesh.vertices[:, 2])
    assert (mesh_dx.indices[:, 1] == mesh.indices[:, 2]).all()
    assert abs(mesh.scene_size - 1.0) < 1e-6
    # normals are unit
    nl = np.linalg.norm(mesh.vertices[:, 3:], axis=-1)
    np.testing.assert_allclose(nl, 1.0, atol=1e-5)


def test_obj_loader_quads_and_negative_indices(tmp_path):
    obj = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f -4 -3 -2 -1
"""
    path = tmp_path / "quad.obj"
    path.write_text(obj)
    mesh = io_obj.load_obj(str(path))
    assert mesh.indices.shape == (2, 3)  # quad triangulated
    assert mesh.indices.max() == 3


def test_bunny_loads_if_present():
    import os

    path = "/root/reference/Bin/Assets/bunny.obj"
    if not os.path.exists(path):
        return
    mesh = io_obj.load_obj(path)
    assert mesh.vertices.shape[0] == 34835
    assert mesh.indices.shape[0] == 69666
    assert (mesh.indices < mesh.vertices.shape[0]).all()
