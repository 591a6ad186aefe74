"""Dataset tooling tests: alignment math, trajectories, COLMAP IO, metrics."""
import os
import struct

import numpy as np
import jax.numpy as jnp
import pytest

from autovfx_tpu.core import cameras as C
from autovfx_tpu.dataset import alignment as AL
from autovfx_tpu.dataset import colmap as CM
from autovfx_tpu.dataset import trajectories as TR
from autovfx_tpu.utils import metrics as MET


class TestAlignment:
    def test_ransac_mean_normal(self):
        rng = np.random.RandomState(0)
        true_n = np.array([0.1, 0.2, 0.97])
        true_n /= np.linalg.norm(true_n)
        inliers = true_n[None] + 0.01 * rng.randn(900, 3)
        outliers = rng.randn(100, 3)
        normals = np.concatenate([inliers, outliers])
        est = AL.ransac_mean_normal(normals, sample_size=500)
        assert abs(np.dot(est, true_n)) > 0.999

    def test_up_alignment(self):
        up = np.array([0.3, -0.4, 0.85])
        r = AL.up_alignment_rotation(up)
        aligned = r @ (up / np.linalg.norm(up))
        np.testing.assert_allclose(aligned, [0, 0, 1], atol=1e-5)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)

    def test_normalize_poses(self):
        rng = np.random.RandomState(1)
        c2ws = np.tile(np.eye(4), (10, 1, 1))
        c2ws[:, :3, 3] = rng.randn(10, 3) * 5 + 100.0
        out, r, scale = AL.normalize_poses(c2ws)
        centers = out[:, :3, 3]
        np.testing.assert_allclose(centers.mean(0), 0, atol=1e-4)
        assert np.abs(centers).max() <= 1.0 + 1e-5


class TestTrajectories:
    def test_half_sphere_lookat(self, tmp_path):
        cams = TR.half_sphere_trajectory(
            [0, 0, 0.5], radius=2.0, height=1.5, num_frames=12,
            fx=100.0, fy=100.0, width=64, height_px=48,
        )
        assert C.num_cameras(cams) == 12
        # all cameras look at the center: it projects to the principal pt
        for i in range(0, 12, 4):
            cam = C.index_camera(cams, i)
            uv, z = cam.project(jnp.array([[0.0, 0.0, 0.5]]))
            assert float(z[0]) > 0
            np.testing.assert_allclose(
                np.asarray(uv[0]), [32.0, 24.0], atol=1e-2
            )
        p = str(tmp_path / "t.json")
        TR.save_trajectory(p, cams)
        loaded, _, _ = C.load_custom_trajectory(p)
        assert C.num_cameras(loaded) == 12


class TestColmapIO:
    def _write_model(self, d):
        # one PINHOLE camera, two images, three points
        with open(os.path.join(d, "cameras.bin"), "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
            f.write(struct.pack("<4d", 50.0, 50.0, 32.0, 24.0))
        with open(os.path.join(d, "images.bin"), "wb") as f:
            f.write(struct.pack("<Q", 2))
            for i, name in enumerate([b"a.png", b"b.png"]):
                f.write(struct.pack("<i", i + 1))
                f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
                f.write(struct.pack("<3d", 0.0, 0.0, float(i)))
                f.write(struct.pack("<i", 1))
                f.write(name + b"\x00")
                f.write(struct.pack("<Q", 0))
        with open(os.path.join(d, "points3D.bin"), "wb") as f:
            f.write(struct.pack("<Q", 3))
            for i in range(3):
                f.write(struct.pack("<Q", i))
                f.write(struct.pack("<3d", float(i), 0.0, 5.0))
                f.write(struct.pack("<3B", 255, 128, 0))
                f.write(struct.pack("<d", 0.5))
                f.write(struct.pack("<Q", 0))

    def test_read_model(self, tmp_path):
        d = str(tmp_path)
        self._write_model(d)
        cams, imgs, (xyz, rgb) = CM.load_colmap_scene(d)
        assert cams[1].model == "PINHOLE"
        assert len(imgs) == 2
        assert imgs[1].name == "a.png"
        assert xyz.shape == (3, 3)
        np.testing.assert_allclose(rgb[0], [1.0, 128 / 255, 0.0], atol=1e-6)

    def test_to_cameras(self, tmp_path):
        d = str(tmp_path)
        self._write_model(d)
        cams, names = CM.colmap_to_cameras(d)
        assert names == ["a.png", "b.png"]
        cam0 = C.index_camera(cams, 0)
        np.testing.assert_allclose(float(cam0.fx), 50.0)
        # identity rotation, t=(0,0,0) -> center at origin
        np.testing.assert_allclose(np.asarray(cam0.center), 0.0, atol=1e-6)


class TestMetrics:
    def test_eval_split(self):
        assert MET.eval_split(20) == [0, 8, 16]

    def test_evaluate_self_render(self):
        from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
        from autovfx_tpu.utils.synthetic import make_scene

        g, cam = make_scene(n=80, width=32, height=24)
        cfg = RasterConfig(dup_budget=1 << 13, backend="ref")
        cams = C.stack_cameras([cam] * 3)
        gt = np.stack(
            [np.asarray(rasterize(g, cam, config=cfg).color)] * 3
        )
        res = MET.evaluate(g, cams, gt, config=cfg, every_nth=1)
        assert res["psnr"] > 50  # identical render
        assert res["ssim"] > 0.99
        # native JAX LPIPS is always on; identical renders ≈ 0.  In
        # this env (no VGG weights file) the value publishes under the
        # random-features key so it can never be aggregated with real
        # LPIPS(vgg) numbers; with AUTOVFX_LPIPS_WEIGHTS set it moves
        # to the canonical "lpips" key.
        key = (
            "lpips" if res["lpips_source"] == "file"
            else "lpips_random_features"
        )
        assert res[key] is not None and res[key] < 1e-6
