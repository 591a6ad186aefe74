"""Training-stack tests: knn init, losses, densify invariants, and a
small end-to-end fit (PSNR must improve)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autovfx_tpu.core import cameras as C
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.ops.knn import mean_knn_dist2
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
from autovfx_tpu.train import losses as L
from autovfx_tpu.train.densify import DensifyStats, densify_and_prune, reset_opacity
from autovfx_tpu.train.trainer import (
    TrainConfig,
    init_gaussians_from_points,
    init_state,
    train,
    train_step,
)
from autovfx_tpu.utils.synthetic import make_gaussians, make_scene

CFG_RASTER = RasterConfig(dup_budget=1 << 13, backend="ref")


class TestKNN:
    def test_matches_bruteforce(self):
        n = 300
        xyz = jax.random.normal(jax.random.PRNGKey(0), (n, 3))
        ours = np.asarray(mean_knn_dist2(xyz, window=64))
        pts = np.asarray(xyz)
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        exact = np.sort(d2, axis=1)[:, :3].mean(1)
        # Morton-window search is approximate (like simple-knn's boxes):
        # it can only overestimate (searches a candidate subset).
        assert (ours >= exact * 0.999).all()
        rel = np.abs(ours - exact) / np.maximum(exact, 1e-12)
        assert (rel < 0.01).mean() > 0.7
        assert float(np.median(rel)) < 1e-3
        assert (ours > 0).all()

    def test_mask(self):
        xyz = jnp.concatenate(
            [jnp.zeros((4, 3)), 100.0 + jnp.zeros((4, 3))], axis=0
        )
        mask = jnp.array([True] * 4 + [False] * 4)
        out = np.asarray(mean_knn_dist2(xyz, mask))
        assert (out[4:] == 0).all()


class TestLosses:
    def test_ssim_identity(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        assert float(L.ssim(img, img)) > 0.999

    def test_ssim_decreases_with_noise(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        noisy = img + 0.3 * jax.random.normal(jax.random.PRNGKey(1), img.shape)
        assert float(L.ssim(img, noisy)) < float(L.ssim(img, img))

    def test_scale_shift_recovery(self):
        pred = jax.random.uniform(jax.random.PRNGKey(2), (500,)) + 0.5
        target = 2.5 * pred - 0.7
        s, t = L.compute_scale_and_shift(pred, target, jnp.ones((500,), bool))
        assert abs(float(s) - 2.5) < 1e-4
        assert abs(float(t) + 0.7) < 1e-4

    def test_depth_loss_zero_when_aligned(self):
        pred = jax.random.uniform(jax.random.PRNGKey(3), (100,)) + 1.0
        gt = pred * 25.0  # reference divides mono GT by 25
        assert float(L.depth_loss(pred, gt)) < 1e-9

    def test_normal_loss_aligned(self):
        n = jax.random.normal(jax.random.PRNGKey(4), (8, 8, 3))
        val = float(L.normal_loss(n, n))
        assert abs(val - (-0.1)) < 1e-5  # l1=0, cos=-1 -> 0.1*(-1)

    def test_anisotropic(self):
        iso = jnp.ones((10, 3))
        assert float(L.anisotropic_loss(iso)) == 0.0
        aniso = jnp.concatenate(
            [jnp.ones((10, 2)), 10.0 * jnp.ones((10, 1))], axis=1
        )
        assert float(L.anisotropic_loss(aniso)) > 6.9


class TestDensify:
    def make(self, n=64):
        g = make_gaussians(n, jax.random.PRNGKey(0))
        return g.pad_to(2 * n)

    def test_prune_low_opacity(self):
        g = self.make()
        g = g.replace(
            opacity_logit=jnp.full((g.capacity,), -10.0)
        )  # ~0 opacity
        stats = DensifyStats.zero(g.capacity)
        res = densify_and_prune(g, stats, jax.random.PRNGKey(1))
        assert int(res.n_pruned) == 64
        assert int(res.gaussians.num_active) == 0

    def test_clone_small_high_grad(self):
        g = self.make()
        g = g.replace(log_scales=jnp.full((g.capacity, 3), np.log(0.001)))
        stats = DensifyStats(
            grad_accum=jnp.full((g.capacity,), 1.0),
            denom=jnp.ones((g.capacity,)),
            max_radii=jnp.zeros((g.capacity,), jnp.int32),
        )
        res = densify_and_prune(g, stats, jax.random.PRNGKey(1), extent=5.0)
        assert int(res.n_cloned) == 64
        assert int(res.gaussians.num_active) == 128
        assert int(res.dropped) == 0

    def test_split_large_high_grad(self):
        g = self.make()
        g = g.replace(log_scales=jnp.full((g.capacity, 3), np.log(1.0)))
        stats = DensifyStats(
            grad_accum=jnp.full((g.capacity,), 1.0),
            denom=jnp.ones((g.capacity,)),
            max_radii=jnp.zeros((g.capacity,), jnp.int32),
        )
        res = densify_and_prune(g, stats, jax.random.PRNGKey(1), extent=5.0)
        assert int(res.n_split) == 64
        # 64 parents pruned, 128 children wanted, capacity allows 128 free
        assert int(res.gaussians.num_active) == 128
        child_scales = np.asarray(res.gaussians.scales)
        active = np.asarray(res.gaussians.active)
        np.testing.assert_allclose(
            child_scales[active], 1.0 / 1.6, rtol=1e-5
        )

    def test_capacity_overflow_drops(self):
        g = make_gaussians(64, jax.random.PRNGKey(0))  # no free slots
        g = g.replace(log_scales=jnp.full((64, 3), np.log(0.001)))
        stats = DensifyStats(
            grad_accum=jnp.full((64,), 1.0),
            denom=jnp.ones((64,)),
            max_radii=jnp.zeros((64,), jnp.int32),
        )
        res = densify_and_prune(g, stats, jax.random.PRNGKey(1))
        assert int(res.dropped) == 64
        assert int(res.gaussians.num_active) == 64

    def test_reset_opacity(self):
        g = self.make()
        g2 = reset_opacity(g)
        op = np.asarray(g2.opacity)[np.asarray(g2.active)]
        assert (op <= 0.0101).all()

    def test_stats_update_reference_units(self):
        # The default grad_threshold 2e-4 is calibrated to the CUDA
        # backward's NDC-scaled mean2D gradient (backward.cu:488:
        # dL_dmean2D * 0.5*W / 0.5*H).  A realistic-image pixel-space
        # gradient must be scaled into those units or densification
        # never triggers.
        g = self.make()
        w, h = 1296, 840
        stats = DensifyStats.zero(g.capacity)
        pix_grad = jnp.full((g.capacity, 2), 4e-7, jnp.float32)
        # raw pixel-space norm is far below threshold...
        assert float(jnp.linalg.norm(pix_grad[0])) < 2e-4
        radii = jnp.where(g.active, 5, 0).astype(jnp.int32)
        stats = stats.update(pix_grad, radii, w, h)
        # ...but in reference units it crosses it
        assert float(stats.grad_accum[0]) >= 2e-4
        g_small = g.replace(
            log_scales=jnp.full((g.capacity, 3), np.log(0.001))
        )
        res = densify_and_prune(
            g_small, stats, jax.random.PRNGKey(1), extent=5.0
        )
        assert int(res.n_cloned) == 64


class TestTrainEndToEnd:
    @pytest.mark.slow
    def test_fit_improves_psnr(self):
        # GT scene and renders
        gt_g, _ = make_scene(n=120, width=48, height=36, key=0)
        cams = C.stack_cameras(
            [
                C.look_at_camera(
                    [3 * np.cos(a), 3 * np.sin(a), 1.0],
                    [0, 0, 0],
                    [0, 0, 1],
                    fx=40.0,
                    fy=40.0,
                    width=48,
                    height=36,
                )
                for a in np.linspace(0, 2 * np.pi, 6, endpoint=False)
            ]
        )
        imgs = jnp.stack(
            [
                rasterize(gt_g, C.index_camera(cams, i), config=CFG_RASTER).color
                for i in range(6)
            ]
        )
        # init from noisy GT points
        key = jax.random.PRNGKey(7)
        pts = gt_g.xyz + 0.05 * jax.random.normal(key, gt_g.xyz.shape)
        g0 = init_gaussians_from_points(
            pts, jnp.full((120, 3), 0.5)
        ).pad_to(256)
        cfg = TrainConfig(
            iterations=150,
            raster=CFG_RASTER,
            densify_from_iter=50,
            densification_interval=50,
            opacity_reset_interval=10_000,
            spatial_lr_scale=2.0,
        )
        state, hist = train(g0, cams, imgs, cfg, log_every=150)
        # eval PSNR before/after on camera 0
        cam0 = C.index_camera(cams, 0)
        p0 = float(
            L.psnr(rasterize(g0, cam0, config=CFG_RASTER).color, imgs[0])
        )
        p1 = float(
            L.psnr(
                rasterize(state.gaussians, cam0, config=CFG_RASTER).color,
                imgs[0],
            )
        )
        assert p1 > p0 + 3.0, (p0, p1)

    def test_single_step_finite(self):
        g, cam = make_scene(n=50, width=32, height=24, key=1)
        img = rasterize(g, cam, config=CFG_RASTER).color
        state = init_state(g)
        cfg = TrainConfig(raster=CFG_RASTER)
        state2, aux = jax.jit(
            lambda s: train_step(s, cam, img, cfg)
        )(state)
        assert np.isfinite(float(aux.loss))
        for f in ("xyz", "log_scales", "opacity_logit"):
            assert np.isfinite(np.asarray(getattr(state2.gaussians, f))).all()


class TestInitPoints:
    def _setup(self):
        from autovfx_tpu.core.cameras import look_at_camera

        # ground quad at z=0 spanning [-5,5]^2
        verts = np.array(
            [[-5, -5, 0], [5, -5, 0], [5, 5, 0], [-5, 5, 0]], np.float32
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        cam = look_at_camera(
            eye=[0, 0, 3], target=[0, 0.01, 0], up=[0, 1, 0],
            fx=40.0, fy=40.0, width=32, height=24,
        )
        cams = C.stack_cameras([cam, cam])
        images = np.zeros((2, 24, 32, 3), np.float32)
        images[..., 1] = 0.75  # green ground
        return verts, faces, cams, images

    def test_ray_mesh_points_on_mesh(self):
        from autovfx_tpu.train.init_points import ray_mesh_init_points

        verts, faces, cams, images = self._setup()
        xyz, rgb = ray_mesh_init_points(
            cams, images, verts, faces, num_points=200,
            rays_per_batch=512,
        )
        assert len(xyz) > 0
        assert np.abs(xyz[:, 2]).max() < 1e-3  # on the z=0 plane
        assert np.abs(xyz[:, :2]).max() <= 5.0 + 1e-3
        assert np.allclose(rgb[:, 1], 0.75)  # picked up pixel color

    def test_hybrid_doubles_count(self):
        from autovfx_tpu.train.init_points import build_init_points

        verts, faces, cams, images = self._setup()
        colmap_xyz = np.random.RandomState(0).randn(150, 3).astype(
            np.float32
        )
        colmap_rgb = np.full((150, 3), 0.5, np.float32)
        xyz, rgb = build_init_points(
            "hybrid", colmap_xyz, colmap_rgb, cams=cams, images=images,
            mesh_vertices=verts, mesh_faces=faces,
        )
        assert len(xyz) == 300  # 2x COLMAP (dataset_readers.py:176-289)
        assert np.allclose(xyz[:150], colmap_xyz)

    def test_colmap_passthrough_and_errors(self):
        from autovfx_tpu.train.init_points import build_init_points

        xyz = np.ones((5, 3), np.float32)
        rgb = np.ones((5, 3), np.float32)
        x2, r2 = build_init_points("colmap", xyz, rgb)
        assert np.allclose(x2, xyz)
        with pytest.raises(ValueError):
            build_init_points("ray_mesh", xyz, rgb)
        with pytest.raises(ValueError):
            build_init_points("bogus", xyz, rgb)
