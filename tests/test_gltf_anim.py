"""Animated glTF playback tests (edit/gltf_anim.py)."""
import json
import struct

import numpy as np
import pytest


def _build_glb(path, animate=True, skinned=False):
    """Minimal GLB: a triangle, optional translation animation."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    times = np.array([0.0, 1.0], np.float32)
    trans = np.array([[0, 0, 0], [2, 0, 0]], np.float32)

    blobs = [pos.tobytes(), idx.tobytes() + b"\x00\x00"]  # pad to 4
    if animate:
        blobs += [times.tobytes(), trans.tobytes()]
    offsets, off = [], 0
    for b in blobs:
        offsets.append(off)
        off += len(b)
    binbuf = b"".join(blobs)

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {"attributes": {"POSITION": 0}, "indices": 1}
                ]
            }
        ],
        "buffers": [{"byteLength": len(binbuf)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offsets[0], "byteLength": 36},
            {"buffer": 0, "byteOffset": offsets[1], "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
    }
    if animate:
        gltf["bufferViews"] += [
            {"buffer": 0, "byteOffset": offsets[2], "byteLength": 8},
            {"buffer": 0, "byteOffset": offsets[3], "byteLength": 24},
        ]
        gltf["accessors"] += [
            {"bufferView": 2, "componentType": 5126, "count": 2,
             "type": "SCALAR", "min": [0.0], "max": [1.0]},
            {"bufferView": 3, "componentType": 5126, "count": 2,
             "type": "VEC3"},
        ]
        gltf["animations"] = [
            {
                "channels": [
                    {"sampler": 0,
                     "target": {"node": 0, "path": "translation"}}
                ],
                "samplers": [
                    {"input": 2, "output": 3,
                     "interpolation": "LINEAR"}
                ],
            }
        ]

    js = json.dumps(gltf).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    binbuf += b"\x00" * ((4 - len(binbuf) % 4) % 4)
    total = 12 + 8 + len(js) + 8 + len(binbuf)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(binbuf), 0x004E4942))
        f.write(binbuf)


class TestAnimatedGLB:
    def test_static_glb_returns_none(self, tmp_path):
        from autovfx_tpu.edit.gltf_anim import load_animated_glb

        p = str(tmp_path / "static.glb")
        _build_glb(p, animate=False)
        assert load_animated_glb(p) is None

    def test_translation_clip_moves_vertices(self, tmp_path):
        from autovfx_tpu.edit.gltf_anim import load_animated_glb

        p = str(tmp_path / "anim.glb")
        _build_glb(p)
        a = load_animated_glb(p)
        assert a is not None and a.animated
        assert a.duration == pytest.approx(1.0)
        v0 = a.vertices_at(0.0)
        v_half = a.vertices_at(0.5)
        # glTF +x stays +x under the y-up→z-up conversion
        np.testing.assert_allclose(
            v_half[:, 0] - v0[:, 0], 1.0, atol=1e-6
        )

    def test_cyclic_repeat(self, tmp_path):
        """t beyond the clip wraps (fcurve cycles modifier parity)."""
        from autovfx_tpu.edit.gltf_anim import load_animated_glb

        p = str(tmp_path / "anim.glb")
        _build_glb(p)
        a = load_animated_glb(p)
        np.testing.assert_allclose(
            a.vertices_at(1.25), a.vertices_at(0.25), atol=1e-6
        )

    def test_surfels_follow_deformation(self, tmp_path):
        from autovfx_tpu.edit.gltf_anim import (
            load_animated_glb, surfels_on_deformed,
        )
        from autovfx_tpu.render.meshsplat import sample_mesh_surfels

        p = str(tmp_path / "anim.glb")
        _build_glb(p)
        a = load_animated_glb(p)
        rest = a.rest_mesh()
        surf = sample_mesh_surfels(
            rest.vertices, rest.faces, num_samples=200
        )
        assert "tri" in surf and "bary" in surf
        moved = surfels_on_deformed(surf, a.vertices_at(0.5), a.faces)
        d = moved["points"] - surf["points"]
        np.testing.assert_allclose(d[:, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(d[:, 1:], 0.0, atol=1e-5)
        assert np.isfinite(moved["normals"]).all()

    def test_scene_animated_surfels(self, tmp_path):
        """SceneRepresentation plays the clip per frame."""
        from autovfx_tpu.edit.scene_representation import (
            SceneRepresentation,
        )

        p = str(tmp_path / "anim.glb")
        _build_glb(p)

        class Dummy:
            fps = 10
            _mesh_cache = {}
            _surfel_cache = {}
            _object_surfels = SceneRepresentation._object_surfels
            _animate_surfels = SceneRepresentation._animate_surfels
            _load_mesh = SceneRepresentation._load_mesh

        d = Dummy()
        obj = {"object_path": p}
        surf = d._object_surfels(obj, num_samples=100)
        assert "anim" in surf
        s0 = d._animate_surfels(surf, 0)
        s5 = d._animate_surfels(surf, 5)  # t = 0.5 s
        dx = s5["points"][:, 0] - s0["points"][:, 0]
        # normalized to unit box: the 2-unit hop spans ~2/3 of the
        # normalized extent at half time → ~1/3 shift
        assert np.all(dx > 0.1)
