"""Production solver vs committed sequential-PGS trajectory goldens.

The goldens (tests/golden/physics_*.npz) come from an INDEPENDENT
float64 sequential Gauss-Seidel impulse solver implementing Bullet's
btSequentialImpulseConstraintSolver algorithm with AutoVFX's Bullet
configuration (all_rendering.py:794-818) — see
scripts/gen_physics_goldens.py for the full provenance note.  The
production solver (physics/solver.py) batches impulses Jacobi-style
with mass splitting and uses a uniform-grid mesh contact query; these
tests bound how far that TPU-oriented reformulation drifts from
sequential-PGS trajectories ("matching physics trajectories",
BASELINE.md).

Bounds are set at ~2x the measured r5 deviations (recorded in PERF.md)
so they fail on regressions, not on noise.
"""
import os

import numpy as np
import pytest

from autovfx_tpu.physics import solver as S
from autovfx_tpu.physics import world as PW

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

GROUND_V = np.array(
    [[-20, -20, 0], [20, -20, 0], [20, 20, 0], [-20, 20, 0]], np.float32
)
GROUND_F = np.array([[0, 1, 2], [0, 2, 3]], np.int64)


def cube_corners(half):
    return np.array(
        [
            [sx * half[0], sy * half[1], sz * half[2]]
            for sx in (-1, 1)
            for sy in (-1, 1)
            for sz in (-1, 1)
        ],
        np.float32,
    )


def quat_to_rotmat_np(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )


def run_scene(name):
    d = np.load(os.path.join(GOLDEN, f"physics_{name}.npz"))
    halves = d["half"]
    objects = []
    verts = []
    for i in range(len(halves)):
        objects.append(
            {
                "pos": d["init_pos"][i].tolist(),
                "rot": quat_to_rotmat_np(d["init_quat"][i]),
                "scale": 1.0,
                "rigid_body": {
                    "rb_type": "ACTIVE",
                    "mass": 1.0,
                    "restitution": float(d["restitution"][i]),
                },
            }
        )
        verts.append(cube_corners(halves[i]))
    world = PW.RigidWorld.from_objects(
        objects,
        verts,
        scene_vertices=GROUND_V,
        scene_faces=GROUND_F,
        cfg=S.SolverConfig(),
    )
    import jax.numpy as jnp

    world.state = world.state.replace(
        linvel=jnp.asarray(d["init_v"].astype(np.float32))
    )
    frames = d["pos"].shape[0]
    _, pos, quat = PW.simulate(world, frames)
    return np.asarray(pos), np.asarray(quat), d


def max_dev(pos, golden_pos):
    return float(np.abs(pos - golden_pos).max())


class TestTrajectoryGoldens:
    def test_drop(self):
        pos, _, d = run_scene("drop")
        dev = max_dev(pos, d["pos"])
        print(f"drop max |Δpos| = {dev:.4f} m")
        # bounce phase is velocity-sensitive; the rest pose must agree
        # to millimeters and the whole trajectory to the bounce scale
        assert dev < 0.15
        assert max_dev(pos[-5:], d["pos"][-5:]) < 0.01

    def test_tumble(self):
        pos, _, d = run_scene("tumble")
        dev = max_dev(pos, d["pos"])
        rest = max_dev(pos[-5:], d["pos"][-5:])
        print(f"tumble max |Δpos| = {dev:.4f} m, rest |Δ| = {rest:.4f}")
        # edge impacts amplify solver differences; the cube must still
        # settle flat at the same height nearby
        assert dev < 0.25
        assert abs(pos[-1, 0, 2] - d["pos"][-1, 0, 2]) < 0.01
        assert rest < 0.2

    def test_stack(self):
        pos, _, d = run_scene("stack")
        dev = max_dev(pos, d["pos"])
        print(f"stack max |Δpos| = {dev:.4f} m")
        # resting-contact chains are where Jacobi vs sequential PGS
        # diverge most — the stack must stay standing in place
        assert dev < 0.05
        # top cube still on the bottom one, not slid off or exploded
        assert abs(pos[-1, 1, 2] - d["pos"][-1, 1, 2]) < 0.01
        assert max_dev(pos[-5:], d["pos"][-5:]) < 0.03
