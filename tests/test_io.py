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


def test_dds_mip_chain_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    vol = rng.rand(16, 16, 16).astype(np.float32)
    path = str(tmp_path / "mips.dds")
    io_dds.write_dds_r32f_volume(path, vol, mip_count=3)
    tex = io_dds.load_dds(path)
    assert tex.mip_count == 3 and len(tex.mips) == 3
    assert tex.mips[0].shape == (16, 16, 16, 1)
    assert tex.mips[1].shape == (8, 8, 8, 1)
    assert tex.mips[2].shape == (4, 4, 4, 1)
    np.testing.assert_array_equal(tex.mips[0][..., 0], vol)
    # mip 1 is the 2x2x2 box average of mip 0 (XUSGDDSLoader uploads the
    # stored chain; our writer generates it box-filtered)
    want = vol.reshape(8, 2, 8, 2, 8, 2).mean((1, 3, 5))
    np.testing.assert_allclose(tex.mips[1][..., 0], want, atol=1e-6)


def test_dds_cube_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    cube = rng.rand(6, 8, 8, 4).astype(np.float32)
    path = str(tmp_path / "cube.dds")
    io_dds.write_dds_rgba16f_cube(path, cube, mip_count=2)
    tex = io_dds.load_dds(path)
    assert tex.is_cube and tex.mip_count == 2
    assert tex.mips[0].shape == (6, 8, 8, 4)
    assert tex.mips[1].shape == (6, 4, 4, 4)
    np.testing.assert_allclose(
        np.asarray(tex.data, np.float32), cube, atol=2e-3)


def test_dds_volume_into_engine(tmp_path):
    """End-to-end: R32F volume DDS file -> engine -> rendered frame equals
    the in-memory load_volume_data path (`MultiRayCaster.cpp:168-209`)."""
    from multivolumes_tpu.config import RenderConfig
    from multivolumes_tpu.engine import MultiRayCaster
    from multivolumes_tpu.scene import volume as volume_lib

    cfg = RenderConfig(width=96, height=64, grid_size=16, light_grid_size=8,
                       max_ray_samples=16, max_light_samples=8,
                       num_volumes=2, num_volume_srcs=2, cube_map_size=16,
                       shadow_map_size=32)
    density = np.asarray(
        volume_lib.init_grid_data(16, np.float32))[..., 3] / 0.25
    path = str(tmp_path / "density.dds")
    io_dds.write_dds_r32f_volume(path, density.astype(np.float32),
                                 mip_count=2)

    eng_file = MultiRayCaster(cfg)
    eng_file.load_volume_file(0, path)
    img_file = np.asarray(eng_file.render())

    eng_mem = MultiRayCaster(cfg)
    eng_mem.load_volume_data(0, density.astype(np.float32))
    img_mem = np.asarray(eng_mem.render())

    np.testing.assert_allclose(img_file, img_mem, atol=1e-5)
    assert img_file.std() > 1e-3  # actually rendered something
