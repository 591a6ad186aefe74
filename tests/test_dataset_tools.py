"""Known-pose re-triangulation + mono-normal tooling tests."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autovfx_tpu.core import cameras as C
from autovfx_tpu.dataset import mono_normal as MN
from autovfx_tpu.dataset import retriangulate as RT
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
from autovfx_tpu.utils.synthetic import make_gaussians

CFG = RasterConfig(dup_budget=1 << 15, backend="ref")


def _scene_and_cams(n_cams=4, w=192, h=144):
    g = make_gaussians(800, jax.random.PRNGKey(0), spread=0.6)
    cams = C.stack_cameras(
        [
            C.look_at_camera(
                [2.0 * np.cos(a), 2.0 * np.sin(a), 0.8],
                [0, 0, 0], [0, 0, 1],
                fx=90.0, fy=90.0, width=w, height=h,
            )
            for a in np.linspace(0.0, 0.5, n_cams)
        ]
    )
    return g, cams


class TestKnownPoseModel:
    def test_write_model_txt(self, tmp_path):
        _, cams = _scene_and_cams()
        names = [f"{i:05}.png" for i in range(4)]
        RT.write_cameras_txt(cams, str(tmp_path / "cameras.txt"))
        RT.write_images_txt(cams, names, str(tmp_path / "images.txt"))
        cam_lines = [
            line for line in
            (tmp_path / "cameras.txt").read_text().splitlines()
            if line and not line.startswith("#")
        ]
        assert len(cam_lines) == 4
        assert "PINHOLE" in cam_lines[0]
        img_text = (tmp_path / "images.txt").read_text()
        assert "00003.png" in img_text


class TestNativeTriangulation:
    def test_triangulates_near_scene(self, tmp_path):
        """ORB + known-pose triangulation recovers points near the
        rendered splat cloud."""
        from PIL import Image

        g, cams = _scene_and_cams()
        img_dir = tmp_path / "images"
        img_dir.mkdir()
        names = []
        for i in range(4):
            img = np.asarray(
                rasterize(g, C.index_camera(cams, i), config=CFG).color
            )
            name = f"{i:05}.png"
            Image.fromarray(
                (np.clip(img, 0, 1) * 255).astype(np.uint8)
            ).save(img_dir / name)
            names.append(name)
        pts, cols = RT.triangulate_known_poses(
            str(img_dir), cams, names, str(tmp_path / "out"),
            use_colmap=False,
        )
        assert len(pts) > 30, len(pts)
        assert os.path.exists(tmp_path / "out" / "points3d.npz")
        # most triangulated points lie near some splat
        from scipy.spatial import cKDTree

        tree = cKDTree(np.asarray(g.xyz))
        d, _ = tree.query(pts, k=1)
        assert np.median(d) < 0.25, np.median(d)
        assert cols.shape == pts.shape


class TestMonoNormals:
    def test_png_roundtrip(self, tmp_path):
        n = np.random.RandomState(0).randn(16, 16, 3)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        p = str(tmp_path / "x_normal.png")
        MN.save_normal_map(p, n)
        back = MN.load_normal_map(p)
        dot = np.sum(back * n, axis=-1)
        assert dot.min() > 0.98

    def test_normals_from_depth_plane(self):
        """A fronto-parallel plane yields normals toward the camera."""
        cam = C.look_at_camera(
            [0, 0, 0], [0, 0, 1], [0, 1, 0],
            fx=60.0, fy=60.0, width=32, height=32,
        )
        depth = np.full((32, 32), 2.0, np.float32)
        n = MN.normals_from_depth(depth, cam)
        interior = n[4:-4, 4:-4]
        np.testing.assert_allclose(interior[..., 2], -1.0, atol=1e-4)

    def test_priority_and_missing(self, tmp_path):
        names = ["a.png", "b.png"]
        # precomputed for a only
        n = np.zeros((8, 8, 3))
        n[..., 2] = -1.0
        MN.save_normal_map(MN.normal_map_path(str(tmp_path), "a.png"), n)
        with pytest.raises(MN.PrecomputedNormalsMissing):
            MN.get_mono_normals(names, str(tmp_path))
        # with depth fallback it succeeds
        cam = C.look_at_camera(
            [0, 0, 0], [0, 0, 1], [0, 1, 0],
            fx=10.0, fy=10.0, width=8, height=8,
        )
        cams = C.stack_cameras([cam, cam])
        depths = np.full((2, 8, 8), 2.0, np.float32)
        out = MN.get_mono_normals(
            names, str(tmp_path), depths=depths, cams=cams
        )
        assert out.shape == (2, 8, 8, 3)
        assert np.isfinite(out).all()
