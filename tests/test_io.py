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


def test_obj_file_normals_split_and_winding(tmp_path):
    # Two triangles sharing vertices 2,3 but with different vn per face:
    # the shared vertices must split (computePerVertexNormals,
    # XUSGObjLoader.cpp:300-335), and for_dx must keep vertex/normal
    # pairing aligned (normals pair before the winding flip).
    obj = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 1 0 0
vn 0 1 0
vn 0 0 1
f 1//1 2//2 3//3
f 1//1 3//1 4//1
"""
    path = tmp_path / "split.obj"
    path.write_text(obj)
    mesh = io_obj.load_obj(str(path), for_dx=False)
    # vertex 3 (0-based 2) is referenced with vn 3 then vn 1 -> one split
    assert mesh.vertices.shape[0] == 5
    n = mesh.vertices[:, 3:]
    np.testing.assert_allclose(n[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(n[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(n[2], [0, 0, 1], atol=1e-6)  # first pairing
    np.testing.assert_allclose(n[3], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(n[4], [1, 0, 0], atol=1e-6)  # split copy of v3

    # for_dx: same normals land on the same positions (pairing unaffected
    # by the winding flip); z components negate
    mesh_dx = io_obj.load_obj(str(path), for_dx=True)
    assert mesh_dx.vertices.shape[0] == 5
    np.testing.assert_allclose(
        mesh_dx.vertices[:, 3:] * np.array([1, 1, -1], np.float32),
        mesh.vertices[:, 3:], atol=1e-6)
    # winding flipped relative to the non-dx load
    assert (mesh_dx.indices[:, 1] == mesh.indices[:, 2]).all()
    assert (mesh_dx.indices[:, 2] == mesh.indices[:, 1]).all()


def test_obj_native_matches_python(tmp_path):
    from multivolumes_tpu import native

    obj = """
v 0 0 0
v 2 0 0
v 2 2 0
v 0 2 0
v 0 0 1
f 1 2 3 4
f -5 -4 -1
"""
    path = tmp_path / "mix.obj"
    path.write_text(obj)
    for for_dx in (False, True):
        py = io_obj.load_obj(str(path), for_dx=for_dx)
        nat = native.load_obj_native(str(path), for_dx=for_dx)
        if nat is None:  # no toolchain: python fallback is the contract
            continue
        np.testing.assert_allclose(nat.vertices, py.vertices, atol=1e-6)
        np.testing.assert_array_equal(nat.indices, py.indices)
        np.testing.assert_allclose(nat.aabb_min, py.aabb_min)
        np.testing.assert_allclose(nat.aabb_max, py.aabb_max)


def test_obj_native_vn_falls_back(tmp_path):
    from multivolumes_tpu import native

    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\nf 1//1 2//1 3//1\n"
    path = tmp_path / "vn.obj"
    path.write_text(obj)
    # vn-bearing files must route to the split-vertex Python parser
    assert native.load_obj_native(str(path)) is None
