"""Height-field liquid melt solver (render/liquid.py).

Covers the reference's Mantaflow-melt contract (all_rendering.py:
1649-1817, 2575-2585): volume-conserving flow, downhill spreading on a
tilted bed, scene-geometry blocking, and per-frame melted meshes."""
import numpy as np
import pytest

from autovfx_tpu.render.liquid import LiquidConfig, MeltSim


def _cube_points(n=400, edge=0.5, z0=0.0, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.rand(n, 3).astype(np.float32) * edge
    pts[:, 0] -= edge / 2
    pts[:, 1] -= edge / 2
    pts[:, 2] += z0
    nrm = np.tile(np.array([0, 0, 1.0], np.float32), (n, 1))
    return pts, nrm


class TestMeltSolve:
    def setup_method(self):
        self.cfg = LiquidConfig(resolution=48, substeps=6)

    def test_volume_conserved(self):
        pts, nrm = _cube_points()
        sim = MeltSim(pts, nrm, cfg=self.cfg)
        prog = np.linspace(0.0, 1.0, 12)
        fr = sim.run(prog)
        vol = np.asarray(fr.volume)
        # all object volume has been injected by the last frame and no
        # fluid leaves the closed domain
        assert vol[-1] == pytest.approx(sim.volume, rel=1e-4)
        # monotone injection
        assert np.all(np.diff(vol) >= -1e-6)

    def test_puddle_spreads(self):
        pts, nrm = _cube_points()
        sim = MeltSim(pts, nrm, cfg=self.cfg)
        fr = sim.run(np.linspace(0.0, 1.0, 16))
        h = np.asarray(fr.h)
        wet_frac_early = (h[1] > 1e-4).mean()
        wet_frac_late = (h[-1] > 1e-4).mean()
        assert wet_frac_late > wet_frac_early * 1.2
        # the puddle is wider than the object footprint
        foot = np.asarray(sim.footprint).mean()
        assert wet_frac_late > foot * 1.2

    def test_flows_downhill_on_tilted_bed(self):
        pts, nrm = _cube_points()
        # runnier material so the downhill drift is unambiguous within
        # a short clip (D ~ h³/3ν stalls as the film thins)
        cfg = self.cfg._replace(viscosity=2e-4)
        r = cfg.resolution
        sim0 = MeltSim(pts, nrm, cfg=cfg)
        # bed tilted along +x (height decreases with x index)
        slope = np.linspace(1.0, 0.0, r, dtype=np.float32)
        bed = np.tile(slope[:, None], (1, r))
        sim = MeltSim(pts, nrm, bed=bed, cfg=cfg)
        # melt over 10 frames, then 25 frames of pure downhill flow
        prog = np.concatenate(
            [np.linspace(0.0, 1.0, 10), np.ones(25, np.float32)]
        )
        fr = sim.run(prog)
        h = np.asarray(fr.h[-1])
        xs = np.arange(r, dtype=np.float32)
        com_x = float((h.sum(1) * xs).sum() / max(h.sum(), 1e-9))
        # flat bed stays centered; tilted bed pushes mass to high x
        fr0 = sim0.run(prog)
        h0 = np.asarray(fr0.h[-1])
        com_x0 = float((h0.sum(1) * xs).sum() / max(h0.sum(), 1e-9))
        assert com_x > com_x0 + 1.5

    def test_obstacle_blocks_flow(self):
        pts, nrm = _cube_points()
        # runny film + post-melt flow so the puddle genuinely reaches
        # the wall row in the unobstructed control run
        cfg = self.cfg._replace(viscosity=5e-4)
        r = cfg.resolution
        prog = np.concatenate(
            [np.linspace(0.0, 1.0, 8), np.ones(16, np.float32)]
        )
        sim0 = MeltSim(pts, nrm, cfg=cfg)
        # wall just beyond the melt footprint (footprint cells inject
        # volume directly, so the wall must sit outside it)
        foot_rows = np.nonzero(np.asarray(sim0.footprint).sum(1))[0]
        wall = int(foot_rows.max()) + 3
        assert wall + 4 < r
        bed = np.zeros((r, r), np.float32)
        bed[wall : wall + 2, :] = 5.0  # tall wall across the domain
        sim = MeltSim(pts, nrm, bed=bed, cfg=cfg)
        h0 = np.asarray(sim0.run(prog).h[-1])
        h = np.asarray(sim.run(prog).h[-1])
        assert h0[wall + 2 :, :].sum() > 1e-4  # control crosses the row
        assert h[wall + 2 :, :].sum() < 1e-6   # wall blocks it
        assert h[:wall, :].sum() > 0.0

    def test_tracers_melt_and_spread(self):
        pts, nrm = _cube_points()
        cfg = self.cfg._replace(viscosity=5e-4)
        sim = MeltSim(pts, nrm, cfg=cfg)
        prog = np.concatenate(
            [np.linspace(0.0, 1.0, 8), np.ones(16, np.float32)]
        )
        fr = sim.run(prog)
        fluid = np.asarray(fr.tracer_fluid)
        assert fluid[0].mean() < 0.2
        assert fluid[-1].mean() == pytest.approx(1.0)
        # melted tracers collapse toward the bed and spread radially
        p_last = np.asarray(fr.tracer_pos[-1])
        assert p_last[:, 2].max() < pts[:, 2].max() * 0.6 + 1e-3
        spread0 = np.linalg.norm(
            pts[:, :2] - pts[:, :2].mean(0), axis=1
        ).mean()
        spread1 = np.linalg.norm(
            p_last[:, :2] - p_last[:, :2].mean(0), axis=1
        ).mean()
        assert spread1 > spread0 * 1.3
        # normals finite + unit
        n_last = np.asarray(fr.tracer_norm[-1])
        assert np.allclose(np.linalg.norm(n_last, axis=1), 1.0, atol=1e-4)

    def test_frame_mesh(self):
        pts, nrm = _cube_points()
        sim = MeltSim(pts, nrm, cfg=self.cfg)
        fr = sim.run(np.linspace(0.0, 1.0, 10))
        v0, f0 = sim.frame_mesh(fr, 0)
        v1, f1 = sim.frame_mesh(fr, 9)
        assert len(f1) > len(f0)  # puddle mesh grows as melt advances
        assert len(v1) > 0 and f1.max() < len(v1)
        # surface sits above the bed
        assert v1[:, 2].min() >= sim.ground_z - 1e-5


class TestBedFromMesh:
    def test_heightmap_from_scene(self):
        from autovfx_tpu.render.liquid import bed_from_mesh

        # one raised quad in the middle of the domain
        v = np.array(
            [[0.3, 0.3, 0.5], [0.7, 0.3, 0.5], [0.7, 0.7, 0.5],
             [0.3, 0.7, 0.5]], np.float32,
        )
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        bed = bed_from_mesh(
            v, f, origin=np.array([0.0, 0.0]), extent=1.0,
            resolution=32, ground_z=0.0,
        )
        assert bed.shape == (32, 32)
        assert bed[16, 16] == pytest.approx(0.5, abs=1e-3)
        assert bed[2, 2] == pytest.approx(0.0, abs=1e-6)
