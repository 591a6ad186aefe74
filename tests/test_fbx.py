"""Native binary-FBX import (edit/fbx_io.py).

Parity target: blender/all_rendering.py:433-468 (bpy FBX import on the
retrieval path).  Test FBX files are synthesized by a minimal writer
below — both 32-bit (7400) and 64-bit (7500) record layouts, raw and
zlib-deflated arrays — so the parser is exercised without binary
fixtures.
"""
import struct
import zlib

import numpy as np
import pytest

from autovfx_tpu.edit import fbx_io
from autovfx_tpu.edit.mesh_io import load_mesh


# ------------------------------------------------------------ FBX writer
def _prop_bytes(value, compress=False):
    if isinstance(value, str):
        raw = value.encode()
        return b"S" + struct.pack("<I", len(raw)) + raw
    if isinstance(value, float):
        return b"D" + struct.pack("<d", value)
    if isinstance(value, int):
        return b"L" + struct.pack("<q", value)
    arr = np.asarray(value)
    code = {"f4": b"f", "f8": b"d", "i4": b"i", "i8": b"l"}[arr.dtype.str[1:]]
    raw = arr.tobytes()
    if compress:
        comp = zlib.compress(raw)
        return code + struct.pack("<III", arr.size, 1, len(comp)) + comp
    return code + struct.pack("<III", arr.size, 0, len(raw)) + raw


def _node_bytes(name, props=(), children=(), base=0, big=False,
                compress=False):
    prop_data = b"".join(_prop_bytes(p, compress) for p in props)
    name_b = name.encode()
    header_len = (24 if big else 12) + 1 + len(name_b)
    sentinel = b"\x00" * (25 if big else 13)
    # children rendered relative to their own start offsets
    body = prop_data
    child_start = base + header_len + len(prop_data)
    child_blob = b""
    for c in children:
        blob = _render_node(c, child_start + len(child_blob), big, compress)
        child_blob += blob
    if children:
        child_blob += sentinel
    end = base + header_len + len(prop_data) + len(child_blob)
    fmt = "<QQQ" if big else "<III"
    header = struct.pack(fmt, end, len(props), len(prop_data))
    header += struct.pack("<B", len(name_b)) + name_b
    return header + body + child_blob


def _render_node(spec, base, big, compress):
    name, props, children = spec
    return _node_bytes(name, props, children, base=base, big=big,
                       compress=compress)


def write_fbx(path, nodes, version=7400, compress=False):
    big = version >= 7500
    data = fbx_io.MAGIC + struct.pack("<I", version)
    for spec in nodes:
        data += _render_node(spec, len(data), big, compress)
    data += b"\x00" * (25 if big else 13)
    with open(path, "wb") as f:
        f.write(data)


def _p70(name, type_s, *vals):
    return ("P", [name, type_s, "", "A"] + list(vals), [])


def _cube_nodes(translation=(0.0, 0.0, 0.0), rotation=(0.0, 0.0, 0.0),
                scaling=(1.0, 1.0, 1.0), up_axis=1, unit=100.0,
                quad=True, with_uv=False):
    """One cube Geometry bound to one Model.  unit=100 → 1 FBX unit =
    1 m (UnitScaleFactor is cm-based), keeping test coords unscaled."""
    v = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
        np.float64,
    ).ravel()
    if quad:  # one quad face (fan → 2 tris) + 2 tri faces
        poly = np.array([0, 1, 3, ~2, 4, 5, ~7, 0, 2, ~6], np.int32)
    else:
        poly = np.array([0, 1, ~3, 4, 5, ~7, 0, 2, ~6], np.int32)
    geom_children = [
        ("Vertices", [v], []),
        ("PolygonVertexIndex", [poly], []),
    ]
    if with_uv:
        n_pv = len(poly)
        uv = np.linspace(0, 1, 2 * n_pv).astype(np.float64)
        geom_children.append((
            "LayerElementUV", [0], [
                ("MappingInformationType", ["ByPolygonVertex"], []),
                ("ReferenceInformationType", ["Direct"], []),
                ("UV", [uv], []),
            ],
        ))
    model_p70 = ("Properties70", [], [
        _p70("Lcl Translation", "Lcl Translation", *translation),
        _p70("Lcl Rotation", "Lcl Rotation", *rotation),
        _p70("Lcl Scaling", "Lcl Scaling", *scaling),
    ])
    gs = ("GlobalSettings", [], [
        ("Properties70", [], [
            _p70("UpAxis", "int", up_axis),
            _p70("UnitScaleFactor", "double", unit),
        ]),
    ])
    objects = ("Objects", [], [
        ("Geometry", [1000, "Cube\x00\x01Geometry", "Mesh"],
         geom_children),
        ("Model", [2000, "Cube\x00\x01Model", "Mesh"], [model_p70]),
    ])
    conns = ("Connections", [], [
        ("C", ["OO", 1000, 2000], []),
    ])
    return [gs, objects, conns]


class TestParser:
    @pytest.mark.parametrize("version", [7400, 7500])
    def test_roundtrip_layouts(self, tmp_path, version):
        path = str(tmp_path / "cube.fbx")
        write_fbx(path, _cube_nodes(up_axis=2), version=version)
        nodes, ver = fbx_io.parse_fbx(path)
        assert ver == version
        names = [n.name for n in nodes]
        assert names == ["GlobalSettings", "Objects", "Connections"]
        geom = nodes[1].find("Geometry")
        assert len(np.asarray(geom.find("Vertices").props[0])) == 24

    def test_zlib_arrays(self, tmp_path):
        path = str(tmp_path / "cube_z.fbx")
        write_fbx(path, _cube_nodes(up_axis=2), compress=True)
        mesh = fbx_io.load_fbx(path)
        assert len(mesh.vertices) == 8

    def test_not_fbx_raises(self, tmp_path):
        path = str(tmp_path / "bad.fbx")
        with open(path, "wb") as f:
            f.write(b"hello world, definitely not FBX")
        with pytest.raises(ValueError, match="not a binary FBX"):
            fbx_io.parse_fbx(path)


class TestGeometry:
    def test_quad_triangulation(self, tmp_path):
        path = str(tmp_path / "cube.fbx")
        write_fbx(path, _cube_nodes(up_axis=2))
        mesh = fbx_io.load_fbx(path)
        # quad (2 tris) + 2 tris = 4 triangles total
        assert mesh.faces.shape == (4, 3)
        assert mesh.faces.max() < len(mesh.vertices)

    def test_unit_scale(self, tmp_path):
        # unit=1.0 (cm): a 2-unit cube becomes 0.02 m across
        path = str(tmp_path / "cm.fbx")
        write_fbx(path, _cube_nodes(up_axis=2, unit=1.0))
        mesh = fbx_io.load_fbx(path)
        np.testing.assert_allclose(
            mesh.vertices.max(0) - mesh.vertices.min(0), 0.02, atol=1e-6
        )

    def test_yup_to_zup(self, tmp_path):
        # translate +2 along FBX Y (up); after conversion the offset
        # must appear on our +Z axis
        path = str(tmp_path / "yup.fbx")
        write_fbx(path, _cube_nodes(translation=(0.0, 2.0, 0.0),
                                    up_axis=1))
        mesh = fbx_io.load_fbx(path)
        c = mesh.vertices.mean(0)
        np.testing.assert_allclose(c, [0, 0, 2], atol=1e-5)

    def test_model_trs(self, tmp_path):
        # scale 2x + translate; z-up file so no axis remap interferes
        path = str(tmp_path / "trs.fbx")
        write_fbx(path, _cube_nodes(translation=(3.0, 0.0, 0.0),
                                    scaling=(2.0, 2.0, 2.0), up_axis=2))
        mesh = fbx_io.load_fbx(path)
        ext = mesh.vertices.max(0) - mesh.vertices.min(0)
        np.testing.assert_allclose(ext, [4, 4, 4], atol=1e-5)
        np.testing.assert_allclose(mesh.vertices.mean(0), [3, 0, 0],
                                   atol=1e-5)

    def test_rotation_90z(self, tmp_path):
        path = str(tmp_path / "rot.fbx")
        write_fbx(path, _cube_nodes(translation=(0.0, 0.0, 0.0),
                                    rotation=(0.0, 0.0, 90.0),
                                    scaling=(1.0, 2.0, 1.0), up_axis=2))
        mesh = fbx_io.load_fbx(path)
        ext = mesh.vertices.max(0) - mesh.vertices.min(0)
        # the y-stretched cube rotates into x
        np.testing.assert_allclose(ext, [4, 2, 2], atol=1e-4)

    def test_uv_layer(self, tmp_path):
        path = str(tmp_path / "uv.fbx")
        write_fbx(path, _cube_nodes(up_axis=2, with_uv=True))
        mesh = fbx_io.load_fbx(path)
        assert mesh.uv is not None and mesh.uv.shape == (8, 2)


class TestLoadMeshIntegration:
    def test_load_mesh_fbx(self, tmp_path):
        path = str(tmp_path / "asset.fbx")
        write_fbx(path, _cube_nodes(up_axis=2))
        mesh = load_mesh(path)
        assert len(mesh.vertices) == 8
        # insert normalization path works on it
        unit = mesh.normalized_to_unit_box()
        np.testing.assert_allclose(
            unit.vertices.max(0) - unit.vertices.min(0), 1.0, atol=1e-6
        )

    def test_blend_sibling_shim(self, tmp_path):
        fbx_path = str(tmp_path / "car.fbx")
        write_fbx(fbx_path, _cube_nodes(up_axis=2))
        blend_path = str(tmp_path / "car.blend")
        with open(blend_path, "wb") as f:
            f.write(b"BLENDER")
        mesh = load_mesh(blend_path)
        assert len(mesh.vertices) == 8

    def test_blend_without_sibling_raises(self, tmp_path):
        blend_path = str(tmp_path / "lonely.blend")
        with open(blend_path, "wb") as f:
            f.write(b"BLENDER")
        with pytest.raises(ValueError, match="sibling"):
            load_mesh(blend_path)
