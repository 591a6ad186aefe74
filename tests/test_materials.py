"""PBR material application tests (render/materials.py)."""
import os

import numpy as np
import pytest

from autovfx_tpu.render import materials as M
from autovfx_tpu.render import meshsplat as MS

CUBE_V = np.array(
    [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5)
     for z in (-0.5, 0.5)], np.float32
)
CUBE_F = np.array(
    [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
     [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
     [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64
)


@pytest.fixture
def material_folder(tmp_path):
    """PolyHaven-style folder: <name>/<name>_1k/textures/*maps*."""
    from PIL import Image

    root = tmp_path / "red_brick"
    tex = root / "red_brick_1k" / "textures"
    tex.mkdir(parents=True)
    # checkerboard diffuse (red/green), constant roughness, flat normal
    diff = np.zeros((16, 16, 3), np.uint8)
    diff[::2, ::2] = [200, 30, 30]
    diff[1::2, 1::2] = [200, 30, 30]
    diff[diff.sum(-1) == 0] = [30, 200, 30]
    Image.fromarray(diff).save(tex / "red_brick_diff_1k.png")
    Image.fromarray(
        np.full((16, 16, 3), 64, np.uint8)
    ).save(tex / "red_brick_rough_1k.png")
    nor = np.full((16, 16, 3), 128, np.uint8)
    nor[..., 2] = 255  # +z tangent normal
    Image.fromarray(nor).save(tex / "red_brick_nor_gl_1k.png")
    Image.fromarray(
        np.full((16, 16, 3), 128, np.uint8)
    ).save(tex / "red_brick_disp_1k.png")
    return str(root)


class TestLoadMaterial:
    def test_loads_nested_polyhaven_layout(self, material_folder):
        mat = M.load_material_folder(material_folder)
        assert mat.diffuse.shape == (16, 16, 3)
        assert mat.roughness is not None and mat.roughness.shape == (16, 16)
        assert mat.normal is not None
        assert mat.displacement is not None
        np.testing.assert_allclose(mat.roughness, 64 / 255.0, atol=1e-3)

    def test_missing_diffuse_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            M.load_material_folder(str(tmp_path))


class TestApplyMaterial:
    def test_surfel_colors_change_and_roughness_set(self, material_folder):
        surf = MS.sample_mesh_surfels(CUBE_V, CUBE_F, num_samples=2000)
        mat = M.load_material_folder(material_folder)
        out = M.apply_material_to_surfels(surf, mat)
        cols = out["colors"]
        # checkerboard: both red-ish and green-ish samples present
        assert (cols[:, 0] > 0.5).any() and (cols[:, 1] > 0.5).any()
        assert "roughness" in out
        np.testing.assert_allclose(out["roughness"], 64 / 255.0, atol=1e-2)
        # flat normal map + mid displacement: geometry ~unchanged
        np.testing.assert_allclose(
            out["points"], surf["points"], atol=1e-2
        )

    def test_render_pixel_diff(self, material_folder):
        """apply_material with a material_path visibly changes the render."""
        import jax.numpy as jnp

        from autovfx_tpu.core import cameras as C
        from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
        from autovfx_tpu.render.ibl import envmap_sh9

        cam = C.look_at_camera(
            [1.8, 1.2, 1.0], [0, 0, 0], [0, 0, 1],
            fx=60.0, fy=60.0, width=64, height=48,
        )
        env = np.full((8, 16, 3), 0.8, np.float32)
        env_sh = jnp.asarray(envmap_sh9(env))
        surf = MS.sample_mesh_surfels(CUBE_V, CUBE_F, num_samples=4000)
        cfg = RasterConfig(dup_budget=1 << 14, backend="ref")

        def render(s):
            g = MS.shaded_object_gaussians(
                s, jnp.asarray(env), env_sh, cam.center
            )
            return np.asarray(rasterize(g, cam, config=cfg).color)

        plain = render(surf)
        mat = M.load_material_folder(material_folder)
        textured = render(M.apply_material_to_surfels(surf, mat))
        diff = np.abs(plain - textured).max(-1)
        assert (diff > 0.1).sum() > 50  # a visible change, not a no-op


class TestHueShift:
    def test_rgb_hsv_roundtrip(self):
        rng = np.random.RandomState(0)
        rgb = rng.rand(100, 3)
        back = M.hsv_to_rgb(M.rgb_to_hsv(rgb))
        np.testing.assert_allclose(back, rgb, atol=1e-6)

    def test_shift_moves_toward_target(self):
        greens = np.tile(np.array([[0.1, 0.8, 0.1]]), (50, 1))
        shifted = M.hue_shift_colors(greens, [0.9, 0.1, 0.1],
                                     move_ratio=1.0)
        # fully shifted: hue becomes red-dominant, value preserved
        assert (shifted[:, 0] > shifted[:, 1]).all()
        np.testing.assert_allclose(
            shifted.max(-1), greens.max(-1), atol=1e-6
        )

    def test_partial_shift(self):
        greens = np.tile(np.array([[0.1, 0.8, 0.1]]), (10, 1))
        half = M.hue_shift_colors(greens, [0.9, 0.1, 0.1], move_ratio=0.5)
        full = M.hue_shift_colors(greens, [0.9, 0.1, 0.1], move_ratio=1.0)
        h_half = M.rgb_to_hsv(half)[0, 0]
        h_full = M.rgb_to_hsv(full)[0, 0]
        h_orig = M.rgb_to_hsv(greens)[0, 0]
        assert abs(h_half - h_orig) < abs(h_full - h_orig) + 1e-9
        assert abs(h_half - h_orig) > 0.01


class TestSceneIntegration:
    def test_scene_surfels_bake_material(self, tmp_path, material_folder):
        """SceneRepresentation._object_surfels consumes material_path."""
        from autovfx_tpu.edit import mesh_io

        obj_path = str(tmp_path / "cube.obj")
        mesh_io.save_obj(
            obj_path, mesh_io.Mesh(vertices=CUBE_V, faces=CUBE_F)
        )

        class Dummy:
            _mesh_cache = {}
            _surfel_cache = {}
            from autovfx_tpu.edit.scene_representation import (
                SceneRepresentation,
            )
            _load_mesh = SceneRepresentation._load_mesh
            _object_surfels = SceneRepresentation._object_surfels

        d = Dummy()
        obj = {
            "object_path": obj_path,
            "material": {"material_path": material_folder, "rgb": None},
        }
        surf = d._object_surfels(obj, num_samples=500)
        assert surf.get("material_baked")
        assert "roughness" in surf
        # no material: separate cache entry, no bake
        plain = d._object_surfels({"object_path": obj_path},
                                  num_samples=500)
        assert not plain.get("material_baked")
