"""SuGaR layer tests: density field, regularization, marching tets,
level-set extraction, mesh extraction, mesh-bound refinement."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autovfx_tpu.core import cameras as C
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.ops.rasterize import RasterConfig
from autovfx_tpu.sugar import density as D
from autovfx_tpu.sugar import regularization as REG
from autovfx_tpu.sugar.marching import (
    decimate_vertex_clustering,
    marching_tetrahedra,
)
from autovfx_tpu.utils.synthetic import make_gaussians

CFG = RasterConfig(dup_budget=1 << 14, backend="ref")


def sphere_shell_gaussians(n=600, radius=1.0, key=0):
    """Gaussians on a sphere surface (a well-defined level set)."""
    k = jax.random.PRNGKey(key)
    d = jax.random.normal(k, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    g = make_gaussians(n, k, scale_range=(0.05, 0.08))
    return g.replace(
        xyz=d * radius,
        opacity_logit=jnp.full((n,), 3.0),  # ~0.95
        log_scales=jnp.full((n, 3), np.log(0.06)),
    )


class TestDensity:
    def test_density_peaks_at_centers(self):
        g = sphere_shell_gaussians()
        nbrs = D.reset_neighbors(g)
        at_centers = D.compute_density(g.xyz[:50], nbrs[:50], g)
        far = D.compute_density(
            jnp.zeros((1, 3)), nbrs[:1], g
        )  # sphere center is empty
        assert float(at_centers.min()) > 0.9
        assert float(far[0]) < 0.05

    def test_beta_matches_min_scale(self):
        g = sphere_shell_gaussians()
        nbrs = D.reset_neighbors(g)
        beta = D.compute_beta(g.xyz[:10], nbrs[:10], g)
        np.testing.assert_allclose(np.asarray(beta), 0.06, rtol=1e-3)

    def test_gradient_points_outward_inside_shell(self):
        g = sphere_shell_gaussians()
        nbrs = D.reset_neighbors(g)
        # just inside the shell, density increases toward the surface
        pts = g.xyz[:20] * 0.9
        grad = D.density_gradient(pts, nbrs[:20], g)
        radial = jnp.sum(
            grad * g.xyz[:20] / jnp.linalg.norm(g.xyz[:20], axis=1,
                                                keepdims=True),
            axis=1,
        )
        assert (np.asarray(radial) > 0).mean() > 0.9

    def test_sample_points_in_gaussians(self):
        g = sphere_shell_gaussians()
        pts, src = D.sample_points_in_gaussians(
            g, jax.random.PRNGKey(1), 1000
        )
        r = np.linalg.norm(np.asarray(pts), axis=1)
        assert abs(r.mean() - 1.0) < 0.1


class TestRegularization:
    def test_entropy_zero_at_binary(self):
        g = sphere_shell_gaussians()
        g_bin = g.replace(opacity_logit=jnp.full((g.capacity,), 20.0))
        assert float(REG.opacity_entropy_loss(g_bin)) < 1e-4
        g_half = g.replace(opacity_logit=jnp.zeros((g.capacity,)))
        assert float(REG.opacity_entropy_loss(g_half)) > 0.6

    @pytest.mark.slow
    def test_density_reg_differentiable(self):
        g = sphere_shell_gaussians(n=200)
        cam = C.look_at_camera(
            [3.0, 0, 0.5], [0, 0, 0], [0, 0, 1], fx=40.0, fy=40.0,
            width=48, height=36,
        )
        from autovfx_tpu.ops.rasterize import rasterize

        out = rasterize(g, cam, config=CFG)
        samples = REG.sample_sdf_points(g, jax.random.PRNGKey(2), 512)

        def loss(xyz):
            g2 = g.replace(xyz=xyz)
            return REG.density_regularization_loss(
                g2, samples, cam, out.depth, out.alpha
            )

        val, grad = jax.value_and_grad(loss)(g.xyz)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()
        assert np.abs(np.asarray(grad)).max() > 0


class TestMarchingTets:
    def _sphere_grid(self, res=48, r=0.7):
        xs = np.linspace(-1, 1, res)
        gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
        vals = r - np.sqrt(gx**2 + gy**2 + gz**2)  # >0 inside
        return vals, xs

    def test_sphere_surface(self):
        vals, xs = self._sphere_grid()
        sp = xs[1] - xs[0]
        v, f = marching_tetrahedra(vals, 0.0, [-1, -1, -1], sp)
        assert len(v) > 500 and len(f) > 500
        r = np.linalg.norm(v, axis=1)
        np.testing.assert_allclose(r, 0.7, atol=0.05)
        # surface is closed: every edge shared by exactly 2 faces
        edges = np.sort(
            np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1
        )
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).mean() > 0.99

    def test_empty_grid(self):
        vals = np.zeros((8, 8, 8), np.float32)
        v, f = marching_tetrahedra(vals, 0.5, [0, 0, 0], 1.0)
        assert len(v) == 0 and len(f) == 0

    def test_decimation(self):
        vals, xs = self._sphere_grid(res=64)
        v, f = marching_tetrahedra(vals, 0.0, [-1, -1, -1], xs[1] - xs[0])
        v2, f2 = decimate_vertex_clustering(v, f, len(v) // 4)
        assert len(v2) < len(v)
        r = np.linalg.norm(v2, axis=1)
        np.testing.assert_allclose(r, 0.7, atol=0.08)


class TestLevelSet:
    @pytest.mark.slow
    def test_sphere_level_points(self):
        g = sphere_shell_gaussians(n=800)
        cam = C.look_at_camera(
            [3.0, 0, 0], [0, 0, 0], [0, 0, 1], fx=60.0, fy=60.0,
            width=64, height=48,
        )
        from autovfx_tpu.sugar.levelset import level_surface_from_camera

        ls = level_surface_from_camera(g, cam, config=CFG, pixel_stride=2)
        m = np.asarray(ls.valid)
        assert m.sum() > 100
        r = np.linalg.norm(np.asarray(ls.points)[m], axis=1)
        # points lie near the shell (radius 1 ± gaussian support)
        assert abs(np.median(r) - 1.0) < 0.15


class TestMeshExtraction:
    @pytest.mark.slow
    def test_extract_sphere_mesh(self):
        from autovfx_tpu.sugar.extract_mesh import density_grid_mesh

        g = sphere_shell_gaussians(n=800)
        v, f = density_grid_mesh(
            g, [-1.5, -1.5, -1.5], [1.5, 1.5, 1.5], resolution=64,
            level=0.3,
        )
        assert len(v) > 200
        r = np.linalg.norm(v, axis=1)
        assert abs(np.median(r) - 1.0) < 0.15


class TestRefine:
    def _tri_mesh(self):
        from autovfx_tpu.edit.mesh_io import Mesh

        v = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
        )
        f = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
        c = np.array(
            [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32
        )
        return Mesh(vertices=v, faces=f, vertex_colors=c)

    def test_bind_and_realize(self):
        from autovfx_tpu.sugar.refine import bind_to_mesh, realize

        for n in (1, 3, 4, 6):
            bg = bind_to_mesh(self._tri_mesh(), n_per_triangle=n)
            g = realize(bg)
            assert g.capacity == 2 * n
            # all splats on the z=0 plane, min axis = z
            np.testing.assert_allclose(np.asarray(g.xyz[:, 2]), 0, atol=1e-6)
            normals = np.asarray(g.normals())
            np.testing.assert_allclose(np.abs(normals[:, 2]), 1, atol=1e-5)

    def test_realize_differentiable(self):
        from autovfx_tpu.sugar.refine import bind_to_mesh, realize

        bg = bind_to_mesh(self._tri_mesh(), n_per_triangle=3)

        def loss(verts):
            g = realize(bg.replace(vertices=verts))
            return jnp.sum(g.xyz**2) + jnp.sum(g.scales)

        grad = jax.grad(loss)(bg.vertices)
        assert np.isfinite(np.asarray(grad)).all()
        assert np.abs(np.asarray(grad)).max() > 0

    def test_bake_texture(self):
        from autovfx_tpu.sugar.refine import bake_texture, bind_to_mesh

        bg = bind_to_mesh(self._tri_mesh())
        tex, uv = bake_texture(bg, texture_size=64, square_size=8)
        assert tex.shape == (64, 64, 3)
        assert uv.shape == (6, 2)
        assert ((uv >= 0) & (uv <= 1)).all()
        assert tex.max() > 0


class TestCoarseTrain:
    @pytest.mark.slow
    def test_short_coarse_training_runs(self):
        from autovfx_tpu.sugar.coarse_train import SugarConfig, coarse_train
        from autovfx_tpu.train.trainer import TrainConfig
        from autovfx_tpu.ops.rasterize import rasterize

        g = sphere_shell_gaussians(n=150)
        cams = C.stack_cameras(
            [
                C.look_at_camera(
                    [3 * np.cos(a), 3 * np.sin(a), 0.5],
                    [0, 0, 0],
                    [0, 0, 1],
                    fx=30.0,
                    fy=30.0,
                    width=32,
                    height=24,
                )
                for a in np.linspace(0, 2 * np.pi, 4, endpoint=False)
            ]
        )
        imgs = jnp.stack(
            [
                rasterize(g, C.index_camera(cams, i), config=CFG).color
                for i in range(4)
            ]
        )
        cfg = SugarConfig(
            base=TrainConfig(
                iterations=30,
                raster=CFG,
                densify_from_iter=10**9,
                spatial_lr_scale=2.0,
            ),
            regularize_from=10,
            n_sdf_samples=256,
        )
        state, hist = coarse_train(g, cams, imgs, cfg, log_every=30)
        assert np.isfinite(hist[-1]["loss"])
        assert np.isfinite(
            np.asarray(state.gaussians.xyz)
        ).all()


def _octa_mesh(subdiv=1, radius=0.8):
    """Subdivided octahedron sphere (small, watertight)."""
    from autovfx_tpu.edit.mesh_io import Mesh

    v = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
         [0, 0, -1]], np.float64
    )
    f = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int64
    )
    for _ in range(subdiv):
        mids = {}
        nv = list(v)
        nf = []

        def mid(a, b):
            k = (min(a, b), max(a, b))
            if k not in mids:
                m = 0.5 * (v[a] + v[b])
                mids[k] = len(nv)
                nv.append(m)
            return mids[k]

        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v = np.array(nv)
        f = np.array(nf, np.int64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True) * radius
    col = 0.5 + 0.5 * v / radius  # position-derived smooth colors
    return Mesh(
        vertices=v.astype(np.float32), faces=f,
        vertex_colors=col.astype(np.float32),
    )


class TestRefineTrain:
    def test_adjacency(self):
        from autovfx_tpu.sugar.refine_train import mesh_adjacency

        m = _octa_mesh(subdiv=0)
        adj = mesh_adjacency(m.faces, len(m.vertices))
        # octahedron: 12 edges, each shared by exactly 2 faces
        assert len(adj.face_pairs) == 12
        assert adj.degree.sum() == 24  # 2 * edges

    def test_normal_consistency_flat_vs_bumpy(self):
        from autovfx_tpu.sugar import refine_train as RT

        m = _octa_mesh(subdiv=1)
        adj = RT.mesh_adjacency(m.faces, len(m.vertices))
        v = jnp.asarray(m.vertices)
        f = jnp.asarray(m.faces)
        pairs = jnp.asarray(adj.face_pairs)
        smooth = RT.normal_consistency_loss(v, f, pairs)
        rng = np.random.RandomState(0)
        bump = v + jnp.asarray(
            0.15 * rng.randn(*v.shape).astype(np.float32)
        )
        bumpy = RT.normal_consistency_loss(bump, f, pairs)
        assert float(bumpy) > float(smooth)

    @pytest.mark.slow
    def test_refine_improves_psnr_and_exports(self, tmp_path):
        from autovfx_tpu.ops.rasterize import rasterize
        from autovfx_tpu.sugar.refine import (
            bind_to_mesh, export_refined_mesh, realize,
        )
        from autovfx_tpu.sugar.refine_train import (
            RefineConfig, refine_train,
        )

        m = _octa_mesh(subdiv=1)
        gt = bind_to_mesh(m, n_per_triangle=1)
        cams = C.stack_cameras(
            [
                C.look_at_camera(
                    [2.5 * np.cos(a), 2.5 * np.sin(a), 0.8],
                    [0, 0, 0], [0, 0, 1],
                    fx=40.0, fy=40.0, width=48, height=36,
                )
                for a in np.linspace(0, 2 * np.pi, 4, endpoint=False)
            ]
        )
        imgs = jnp.stack(
            [
                rasterize(
                    realize(gt), C.index_camera(cams, i), config=CFG
                ).color
                for i in range(4)
            ]
        )
        # perturb colors badly; training must recover them
        start = gt.replace(
            vertex_colors=jnp.full_like(gt.vertex_colors, 0.5)
        )
        cfg = RefineConfig(
            iterations=60, raster=CFG, normal_consistency=0.1,
            feature_lr=0.05,
        )
        refined, hist = refine_train(
            start, cams, imgs, cfg, log_every=10
        )
        assert hist[-1]["psnr"] > hist[0]["psnr"] + 1.0
        assert np.isfinite(np.asarray(refined.vertices)).all()

        export_refined_mesh(refined, str(tmp_path / "refined.obj"),
                            texture_size=128, square_size=8)
        assert (tmp_path / "refined.obj").exists()
        assert (tmp_path / "refined.mtl").exists()
        assert (tmp_path / "refined.png").exists()
        text = (tmp_path / "refined.obj").read_text()
        assert "vt " in text and "f " in text

    def test_bake_texture_barycentric_gradient(self):
        from autovfx_tpu.sugar.refine import bake_texture, bind_to_mesh
        from autovfx_tpu.edit.mesh_io import Mesh

        v = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
        )
        f = np.array([[0, 1, 2]], np.int64)
        c = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        bg = bind_to_mesh(Mesh(vertices=v, faces=f, vertex_colors=c))
        tex, uv = bake_texture(bg, texture_size=16, square_size=8)
        sq = tex[:8, :8]
        # corner texels approach the three vertex colors (gradient,
        # not flat): v0 red at (0,0), v1 green at (0,7), v2 blue (7,0)
        assert sq[0, 0, 0] > 0.7 and sq[0, 0, 1] < 0.3
        assert sq[0, 7, 1] > 0.7 and sq[0, 7, 0] < 0.3
        assert sq[7, 0, 2] > 0.7 and sq[7, 0, 0] < 0.3
        # center is a mix, not equal to any corner
        assert 0.2 < sq[3, 3].max() < 0.7


class TestTSDFFusion:
    def _sphere_setup(self, n=800):
        g = sphere_shell_gaussians(n=n)
        cams = C.stack_cameras(
            [
                C.look_at_camera(
                    [3 * np.cos(a), 3 * np.sin(a), 1.2 * np.sin(2 * a)],
                    [0, 0, 0], [0, 0, 1],
                    fx=60.0, fy=60.0, width=64, height=48,
                )
                for a in np.linspace(0, 2 * np.pi, 12, endpoint=False)
            ]
        )
        return g, cams

    @pytest.mark.slow
    def test_tsdf_mesh_sane(self):
        """TSDF fusion produces a clean near-spherical surface."""
        from autovfx_tpu.sugar.sdf_fusion import tsdf_mesh

        g, cams = self._sphere_setup()
        bb = ([-1.4, -1.4, -1.4], [1.4, 1.4, 1.4])
        v_t, f_t = tsdf_mesh(
            g, cams, *bb, config=CFG, resolution=64, every_nth=1
        )
        assert len(v_t) > 200 and len(f_t) > 200
        r_t = np.linalg.norm(v_t, axis=1)
        assert abs(np.median(r_t) - 1.1) < 0.25  # near the shell
        # interior stays solid, far exterior stays empty
        assert np.mean(r_t < 0.7) < 0.02
        assert np.mean(r_t > 1.8) < 0.05

    @pytest.mark.slow
    def test_poisson_beats_density_grid(self):
        """VERDICT gate: the screened-Poisson mesh's RMS-to-levelset
        beats the round-1 marching-tets density mesh."""
        from scipy.spatial import cKDTree

        from autovfx_tpu.sugar.extract_mesh import (
            density_grid_mesh,
            extract_level_points,
            remove_outliers,
        )
        from autovfx_tpu.sugar.poisson import poisson_mesh_from_gaussians

        g, cams = self._sphere_setup()
        v_p, f_p = poisson_mesh_from_gaussians(
            g, cams, config=CFG, resolution=96, every_nth=1
        )
        v_d, _ = density_grid_mesh(
            g, [-1.4] * 3, [1.4] * 3, resolution=64, level=0.3
        )
        assert len(v_p) > 200 and len(f_p) > 200
        pts, nrm = extract_level_points(g, cams, config=CFG, every_nth=1)
        pts, _ = remove_outliers(pts, nrm)
        tree = cKDTree(pts)

        def rms_to_levelset(v):
            d, _ = tree.query(np.asarray(v), k=1)
            return float(np.sqrt(np.mean(d**2)))

        rms_p = rms_to_levelset(v_p)
        rms_d = rms_to_levelset(v_d)
        assert rms_p < 0.7 * rms_d, (rms_p, rms_d)
        # one connected surface (no spurious blobs)
        parent = np.arange(len(v_p))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b, c in f_p:
            parent[find(b)] = find(a)
            parent[find(c)] = find(a)
        comps = {find(i) for i in np.unique(f_p.reshape(-1))}
        assert len(comps) <= 3

    @pytest.mark.slow
    def test_tsdf_watertight_interior(self):
        """φ is negative inside the sphere, positive near the cameras."""
        from autovfx_tpu.sugar.sdf_fusion import (
            render_depth_maps, tsdf_fuse,
        )

        g, cams = self._sphere_setup()
        sub, depths, valids = render_depth_maps(
            g, cams, config=CFG, every_nth=1
        )
        phi = tsdf_fuse(
            sub, depths, valids, [-1.4] * 3, [1.4] * 3, resolution=48
        )
        c = phi.shape[0] // 2
        assert phi[c, c, c] < 0  # center = inside
        # observed free space outside the shell (on the camera plane)
        assert phi[2, c, c] > 0
        # unobserved corners default to the weak solid prior (no
        # surface is meshed there — tsdf_mesh prunes no-evidence cells)
        assert -0.5 < phi[0, 0, c] <= 0


class TestQuadricDecimation:
    def _sphere_mesh(self):
        from autovfx_tpu.sugar.extract_mesh import density_grid_mesh

        g = sphere_shell_gaussians(n=800)
        return density_grid_mesh(
            g, [-1.4] * 3, [1.4] * 3, resolution=48, level=0.3
        )

    def test_reaches_target_and_preserves_shape(self):
        from autovfx_tpu.sugar.decimate import decimate_quadric

        v, f = self._sphere_mesh()
        target = len(v) // 4
        v2, f2 = decimate_quadric(v, f, target)
        assert len(v2) <= target * 1.02
        assert len(f2) > 0
        r = np.linalg.norm(v2, axis=1)
        assert abs(np.median(r) - np.median(np.linalg.norm(v, axis=1))) < 0.1
        # all faces reference valid vertices
        assert f2.max() < len(v2) and f2.min() >= 0

    def test_beats_vertex_clustering(self):
        """QEM keeps a tighter surface than vertex clustering at the
        same vertex budget (the round-1 weakness being replaced)."""
        from autovfx_tpu.sugar.decimate import decimate_quadric

        v, f = self._sphere_mesh()
        target = len(v) // 8
        v_q, _ = decimate_quadric(v, f, target)
        v_c, _ = decimate_vertex_clustering(v, f, target)
        med = np.median(np.linalg.norm(v, axis=1))
        err_q = np.sqrt(
            np.mean((np.linalg.norm(v_q, axis=1) - med) ** 2)
        )
        err_c = np.sqrt(
            np.mean((np.linalg.norm(v_c, axis=1) - med) ** 2)
        )
        assert err_q <= err_c * 1.1, (err_q, err_c)

    def test_density_prune(self):
        from autovfx_tpu.sugar.decimate import density_quantile_prune

        v = np.random.RandomState(0).randn(100, 3).astype(np.float32)
        f = np.stack(
            [np.arange(0, 98), np.arange(1, 99), np.arange(2, 100)], -1
        )
        dens = np.linspace(0, 1, 100)
        v2, f2 = density_quantile_prune(v, f, dens, quantile=0.2)
        assert len(v2) == 80
        assert f2.max() < len(v2)


class TestBetaModes:
    def test_weighted_average_and_learnable(self):
        g = sphere_shell_gaussians(n=300)
        # non-uniform scales + opacities so the weighting matters
        k = jax.random.PRNGKey(9)
        g = g.replace(
            log_scales=g.log_scales
            + 0.5 * jax.random.normal(k, g.log_scales.shape),
            opacity_logit=2.0 * jax.random.normal(k, (g.capacity,)),
        )
        from autovfx_tpu.ops.knn import knn_indices

        pts = jnp.asarray(np.asarray(g.xyz[:50]))
        nbrs0, _ = knn_indices(g.xyz, g.active, k=8)
        nbrs = nbrs0[:50]
        b_avg = D.compute_beta(pts, nbrs, g, mode="average")
        b_w = D.compute_beta(pts, nbrs, g, mode="weighted_average")
        b_l = D.compute_beta(
            pts, nbrs, g, mode="learnable",
            log_beta=jnp.log(jnp.float32(0.05)),
        )
        assert np.isfinite(np.asarray(b_avg)).all()
        assert np.isfinite(np.asarray(b_w)).all()
        assert (np.asarray(b_w) > 0).all()
        np.testing.assert_allclose(np.asarray(b_l), 0.05, rtol=1e-5)
        # weighted differs from plain average under non-uniform opacity
        assert not np.allclose(np.asarray(b_w), np.asarray(b_avg))

    def test_learnable_beta_differentiable(self):
        g = sphere_shell_gaussians(n=100)
        pts = jnp.asarray(np.asarray(g.xyz[:10]))

        def loss(lb):
            b = D.compute_beta(
                pts, None, g, mode="learnable", log_beta=lb
            )
            return jnp.sum(b**2)

        grad = jax.grad(loss)(jnp.float32(-3.0))
        assert np.isfinite(float(grad)) and float(grad) != 0


class TestSplatMesh:
    def test_faces_move_to_center_depth(self):
        from autovfx_tpu.core import cameras as CC
        from autovfx_tpu.sugar.refine import bind_to_mesh, splat_mesh

        m = _octa_mesh(subdiv=1)
        bg = bind_to_mesh(m)
        cam = CC.look_at_camera(
            [3.0, 0, 0.5], [0, 0, 0], [0, 0, 1],
            fx=50.0, fy=50.0, width=64, height=48,
        )
        out = splat_mesh(bg, cam, mode="perspective")
        assert len(out.vertices) == 3 * len(m.faces)
        # each splatted triangle's vertices project (along the centroid
        # direction) to the centroid's distance — verify for face 0
        from autovfx_tpu.utils.linalg import transform_points

        tri = out.vertices.reshape(-1, 3, 3)[0]
        tc = np.asarray(
            transform_points(jnp.asarray(tri), cam.R, cam.t)
        )
        ctr0 = m.vertices[m.faces[0]].mean(0)
        cc = np.asarray(
            transform_points(jnp.asarray(ctr0[None]), cam.R, cam.t)
        )[0]
        d = cc / np.linalg.norm(cc)
        np.testing.assert_allclose(
            tc @ d, np.linalg.norm(cc), rtol=1e-4
        )
        # depth mode: all vertex view-z equal the centroid z
        out_d = splat_mesh(bg, cam, mode="depth")
        tz = np.asarray(
            transform_points(
                jnp.asarray(out_d.vertices.reshape(-1, 3)), cam.R, cam.t
            )
        )[:, 2].reshape(-1, 3)
        assert np.allclose(tz, tz[:, :1], atol=1e-5)


class TestPostprocessBoundMesh:
    def test_strips_border_readds_opaque(self):
        from autovfx_tpu.sugar.refine import (
            bind_to_mesh, postprocess_bound_mesh,
        )

        # a strip of 4 triangles: the two END faces are border-heavy
        from autovfx_tpu.edit.mesh_io import Mesh

        v = np.array(
            [[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0],
             [0, 1, 0], [1, 1, 0], [2, 1, 0], [3, 1, 0]], np.float32
        )
        f = np.array(
            [[0, 1, 4], [1, 5, 4], [1, 2, 5], [2, 6, 5],
             [2, 3, 6], [3, 7, 6]], np.int64
        )
        bg = bind_to_mesh(Mesh(vertices=v, faces=f), n_per_triangle=3)
        # all faces in a flat strip have border edges → all would be
        # stripped; low opacity keeps them out, high opacity re-adds
        low = bg.replace(
            opacity_logit=jnp.full_like(bg.opacity_logit, -4.0)
        )
        out_low = postprocess_bound_mesh(low, iterations=1)
        assert out_low.faces.shape[0] < f.shape[0]
        high = bg  # initial opacity 0.9
        out_high = postprocess_bound_mesh(high, iterations=1)
        assert out_high.faces.shape[0] == f.shape[0]
        # per-face gaussian params stay aligned
        assert (
            out_low.opacity_logit.shape[0]
            == out_low.faces.shape[0] * 3
        )

    def test_closed_mesh_untouched(self):
        from autovfx_tpu.sugar.refine import (
            bind_to_mesh, postprocess_bound_mesh,
        )

        m = _octa_mesh(subdiv=1)
        bg = bind_to_mesh(m)
        out = postprocess_bound_mesh(bg, iterations=2)
        assert out.faces.shape[0] == bg.faces.shape[0]


class TestDecimateAtScale:
    """Reference-operating-point decimation (coarse_mesh.py:441-458
    decimates Poisson output to 200k/1M verts).  A parametric torus
    grid gives an exact distance-to-surface oracle."""

    @staticmethod
    def torus_grid(n_u, n_v, R=2.0, r=0.7):
        u = np.linspace(0, 2 * np.pi, n_u, endpoint=False)
        v = np.linspace(0, 2 * np.pi, n_v, endpoint=False)
        uu, vv = np.meshgrid(u, v, indexing="ij")
        verts = np.stack(
            [
                (R + r * np.cos(vv)) * np.cos(uu),
                (R + r * np.cos(vv)) * np.sin(uu),
                r * np.sin(vv),
            ],
            -1,
        ).reshape(-1, 3)
        i = np.arange(n_u)[:, None] * n_v + np.arange(n_v)[None, :]
        i10 = np.roll(i, -1, 0)
        i01 = np.roll(i, -1, 1)
        i11 = np.roll(i10, -1, 1)
        faces = np.concatenate(
            [
                np.stack([i, i10, i11], -1).reshape(-1, 3),
                np.stack([i, i11, i01], -1).reshape(-1, 3),
            ]
        )
        return verts, faces

    @pytest.mark.slow
    def test_quarter_million_verts(self):
        from autovfx_tpu.sugar.decimate import decimate_quadric

        v, f = self.torus_grid(500, 500)  # 250k verts
        import time

        t0 = time.time()
        v2, f2 = decimate_quadric(v, f, 50_000)
        dt = time.time() - t0
        assert len(v2) <= 50_000
        assert len(f2) > 50_000  # still a closed-ish surface
        # decimated vertices stay on the torus (quadric placement)
        d = np.abs(
            np.sqrt(
                (np.sqrt(v2[:, 0] ** 2 + v2[:, 1] ** 2) - 2.0) ** 2
                + v2[:, 2] ** 2
            )
            - 0.7
        )
        assert float(np.quantile(d, 0.99)) < 5e-3
        # single-core host budget: 1M->200k measured 113 s (PERF.md);
        # 250k->50k must stay well under a minute
        assert dt < 90.0

    def test_components_at_scale(self):
        from autovfx_tpu.sugar.decimate import remove_small_components

        v, f = self.torus_grid(160, 160)  # 25.6k verts
        # add a tiny disconnected blob
        blob_v = np.array(
            [[10, 10, 10], [10.1, 10, 10], [10, 10.1, 10]], np.float64
        )
        blob_f = np.array([[0, 1, 2]]) + len(v)
        v_all = np.concatenate([v, blob_v])
        f_all = np.concatenate([f, blob_f])
        v2, f2 = remove_small_components(v_all, f_all)
        assert len(v2) == len(v)
        assert len(f2) == len(f)
