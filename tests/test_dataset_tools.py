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


class TestDatasetReaders:
    """Multi-format readers (read_dataset.py parity): TnT, 360/COLMAP,
    LERF, nerfstudio, ScanNet++."""

    def _quat_from_rot(self, r):
        from autovfx_tpu.core.quaternion import rotmat_to_quat

        return np.asarray(rotmat_to_quat(jnp.asarray(r, jnp.float32)))

    def test_tnt_reader_aligns_up(self, tmp_path):
        from autovfx_tpu.dataset import readers as RD

        d = tmp_path / "Playground"
        (d / "pose").mkdir(parents=True)
        c2w = np.eye(4)
        c2w[:3, 3] = [1.0, 2.0, 3.0]
        np.savetxt(d / "pose" / "000001.txt", c2w)
        np.savetxt(d / "intrinsics.txt", np.diag([500.0, 500.0, 1.0]))
        out = RD.read_tnt(str(d))
        assert out.names == ["000001.png"]
        assert out.c2w.shape == (1, 3, 4)
        # the calibrated Playground up vector maps to +z
        up = np.asarray(RD.SCENE_UP_VECTORS["tnt"]["Playground"])
        from autovfx_tpu.dataset.alignment import up_alignment_rotation

        r = up_alignment_rotation(up)
        np.testing.assert_allclose(
            r @ (up / np.linalg.norm(up)), [0, 0, 1], atol=1e-5
        )
        assert out.K[0, 0] == 500.0

    def test_transforms_json_readers(self, tmp_path):
        import json

        from autovfx_tpu.dataset import readers as RD

        d = tmp_path / "capture"
        d.mkdir()
        gl = np.eye(4)
        gl[:3, 3] = [0.5, 0.0, 1.0]
        meta = {
            "fl_x": 400.0, "fl_y": 410.0, "cx": 320.0, "cy": 240.0,
            "w": 640, "h": 480,
            "frames": [
                {"file_path": "images/b.png",
                 "transform_matrix": gl.tolist()},
                {"file_path": "images/a.png",
                 "transform_matrix": gl.tolist()},
            ],
        }
        (d / "transforms.json").write_text(json.dumps(meta))
        out = RD.read_nerfstudio(str(d))
        # sorted by file path
        assert out.names == ["a.png", "b.png"]
        # OpenGL -> OpenCV flips the y/z camera axes
        np.testing.assert_allclose(out.c2w[0, :3, 1], [0, -1, 0], atol=1e-9)
        np.testing.assert_allclose(out.c2w[0, :3, 2], [0, 0, -1], atol=1e-9)
        np.testing.assert_allclose(out.img_wh, [640, 480])
        assert out.K[1, 1] == 410.0
        # unified entry point dispatches
        out2 = RD.read_dataset(str(d), "nerfstudio")
        np.testing.assert_allclose(out2.c2w, out.c2w)
        with pytest.raises(ValueError):
            RD.read_dataset(str(d), "nope")

    def test_360_reader_normalizes_centers(self, tmp_path):
        import struct

        from autovfx_tpu.dataset import readers as RD

        d = tmp_path / "garden"
        sparse = d / "sparse" / "0"
        sparse.mkdir(parents=True)
        # write a 2-image images.bin (w2c identity rotations, offset t)
        with open(sparse / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", 2))
            for i, (name, t) in enumerate(
                [("im1.png", [0, 0, 0]), ("im2.png", [2.0, 0, 0])]
            ):
                f.write(struct.pack("<i", i + 1))
                f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
                f.write(struct.pack("<3d", *[float(x) for x in t]))
                f.write(struct.pack("<i", 1))
                f.write(name.encode() + b"\x00")
                f.write(struct.pack("<Q", 0))
        with open(sparse / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<i", 1))       # camera id
            f.write(struct.pack("<i", 1))       # PINHOLE model id
            f.write(struct.pack("<QQ", 640, 480))
            f.write(struct.pack("<4d", 400.0, 400.0, 320.0, 240.0))
        out = RD.read_360(str(d))
        assert len(out.names) == 2
        # centers zero-mean and inside the 1.1-diagonal unit sphere
        centers = out.c2w[:, :3, 3]
        np.testing.assert_allclose(centers.mean(0), 0.0, atol=1e-9)
        assert np.linalg.norm(centers, axis=1).max() <= 1.0 + 1e-9
        assert out.K[0, 2] == 320.0

    def test_scannetpp_reader(self, tmp_path):
        import json

        from autovfx_tpu.dataset import readers as RD

        d = tmp_path / "scene"
        (d / "dslr" / "colmap").mkdir(parents=True)
        (d / "dslr" / "nerfstudio").mkdir(parents=True)
        (d / "dslr" / "colmap" / "images.txt").write_text(
            "# comment\n"
            "1 1 0 0 0 0.5 0 0 1 img2.jpg\n"
            "1 2 3\n"
            "2 1 0 0 0 0 0 0 1 img1.jpg\n"
            "4 5 6\n"
        )
        (d / "dslr" / "nerfstudio" / "transforms_undistorted.json").write_text(
            json.dumps(
                {"fl_x": 300.0, "fl_y": 300.0, "cx": 100.0, "cy": 90.0,
                 "w": 200, "h": 180}
            )
        )
        out = RD.read_scannetpp(str(d))
        assert out.names == ["img1.jpg", "img2.jpg"]
        # w2c (I, t) -> c2w translation = -t
        np.testing.assert_allclose(out.c2w[1, :3, 3], [-0.5, 0, 0],
                                   atol=1e-9)
        np.testing.assert_allclose(out.img_wh, [200, 180])
