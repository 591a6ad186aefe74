"""Physics solver vs closed-form trajectories (SURVEY §4 test strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autovfx_tpu.physics import solver as S
from autovfx_tpu.physics.shapes import build_hulls, build_mesh_grid, mesh_contact_query
from autovfx_tpu.physics.world import RigidWorld, rb_transform_schema, simulate


def box_verts(half=0.5):
    return np.array(
        [
            [sx * half, sy * half, sz * half]
            for sx in (-1, 1)
            for sy in (-1, 1)
            for sz in (-1, 1)
        ],
        np.float32,
    )


def icosphere_verts(r=0.5, n=80):
    rng = np.random.RandomState(0)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r).astype(np.float32)


def ground_plane(size=20.0, z=0.0):
    v = np.array(
        [[-size, -size, z], [size, -size, z], [size, size, z], [-size, size, z]],
        np.float32,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return v, f


def make_world(objects, verts, with_ground=True, **cfg_kw):
    sv, sf = ground_plane() if with_ground else (None, None)
    cfg = S.SolverConfig(**cfg_kw)
    return RigidWorld.from_objects(
        objects, verts, scene_vertices=sv, scene_faces=sf, cfg=cfg
    )


def obj(pos, rb_type="ACTIVE", mass=1.0, restitution=0.6, name="o"):
    return {
        "object_id": name,
        "pos": list(pos),
        "rot": [0.0, 0.0, 0.0],
        "scale": 1.0,
        "rigid_body": {
            "rb_type": rb_type,
            "mass": mass,
            "restitution": restitution,
        },
    }


class TestShapes:
    def test_hull_mass_properties_box(self):
        shape, coms, vols, inert = build_hulls([box_verts(0.5)])
        np.testing.assert_allclose(coms[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(vols[0], 1.0, rtol=1e-5)
        # unit-mass box inertia = diag(1/12 (b²+c²)) = 1/6 for unit cube
        np.testing.assert_allclose(
            np.diag(inert[0]), 1.0 / 6.0, rtol=0.08
        )

    def test_mesh_query_plane(self):
        v, f = ground_plane()
        grid = build_mesh_grid(v, f)
        pts = jnp.array([[0.0, 0.0, 0.3], [1.0, 2.0, -0.2]])
        d, n, cp = mesh_contact_query(grid, pts)
        # signed distance: +above, -below
        np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(n[1]), [0, 0, 1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(d), [0.3, -0.2], atol=1e-5)


class TestFreeFall:
    def test_matches_discrete_closed_form(self):
        w = make_world([obj([0, 0, 5.0])], [box_verts()], with_ground=False)
        frames = 15
        final, pos, quat = simulate(w, frames)
        dt = 1.0 / (w.cfg.fps * w.cfg.substeps_per_frame)
        n = frames * w.cfg.substeps_per_frame
        # semi-implicit Euler: z_n = z0 - g dt^2 * n(n+1)/2
        z_expect = 5.0 - 9.81 * dt * dt * n * (n + 1) / 2
        np.testing.assert_allclose(pos[-1, 0, 2], z_expect, rtol=1e-4)
        np.testing.assert_allclose(pos[-1, 0, :2], 0.0, atol=1e-6)


class TestGroundContact:
    def test_box_settles_on_plane(self):
        w = make_world([obj([0, 0, 1.5], restitution=0.1)], [box_verts(0.5)])
        final, pos, quat = simulate(w, 45)  # 3 seconds
        # COM of a unit box resting on z=0 is at 0.5 (+margin)
        assert abs(pos[-1, 0, 2] - 0.5) < 0.02, pos[-5:, 0, 2]
        # at rest
        assert abs(pos[-1, 0, 2] - pos[-5, 0, 2]) < 5e-3

    def test_restitution_bounce(self):
        # drop from 1m; elastic-ish bounce should return to ~e^2 * h
        w = make_world(
            [obj([0, 0, 1.5], restitution=0.9)], [icosphere_verts(0.5)]
        )
        final, pos, quat = simulate(w, 60)
        z = pos[:, 0, 2]
        # find apex after first bounce
        touch = np.argmax(z < 0.52)
        apex = z[touch:].max()
        e2 = (0.9 * 0.6) ** 2  # combined restitution vs scene (0.6 factor)
        expect = 0.5 + (1.5 - 0.5) * e2
        assert abs(apex - expect) < 0.22, (apex, expect)

    def test_passive_body_never_moves(self):
        w = make_world(
            [obj([0, 0, 3.0], rb_type="PASSIVE")], [box_verts()]
        )
        final, pos, quat = simulate(w, 20)
        np.testing.assert_allclose(pos[:, 0, 2], 3.0, atol=1e-6)


class TestStacking:
    def test_two_boxes_stack(self):
        w = make_world(
            [
                obj([0, 0, 0.55], restitution=0.0, name="a"),
                obj([0, 0, 1.8], restitution=0.0, name="b"),
            ],
            [box_verts(0.5), box_verts(0.5)],
        )
        final, pos, quat = simulate(w, 60)
        assert abs(pos[-1, 0, 2] - 0.5) < 0.05
        assert abs(pos[-1, 1, 2] - 1.5) < 0.1, pos[-1, :, 2]
        # lateral drift from the impact transient stays bounded
        assert np.abs(pos[-1, :, :2]).max() < 0.15


class TestRBTransform:
    def test_schema(self):
        w = make_world([obj([0, 0, 2.0], name="ball")], [box_verts()])
        final, pos, quat = simulate(w, 5)
        rb = rb_transform_schema(w, pos, quat)
        assert "ball" in rb
        assert set(rb["ball"].keys()) == {str(i) for i in range(5)}
        entry = rb["ball"]["0"]
        assert len(entry["pos"]) == 3
        assert len(entry["rot"]) == 3
        assert entry["scale"] == [1.0, 1.0, 1.0]
