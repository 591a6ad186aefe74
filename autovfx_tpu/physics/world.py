"""Rigid-body world: build from edit-IR objects, simulate, emit rb_transform.

Parity target: the Blender rigid-body path of ``run_blender_render``
(all_rendering.py:2211-2374 setup, :2380-2585 frame loop) and the
``rb_transform`` schema written back into the edit-config JSON
(:2560-2573 — per-object per-frame {pos, rot (xyz euler), scale}) that
``scene_representation.render_from_3DGS`` replays (:357-371).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.core.quaternion import quat_to_rotmat, rotmat_to_quat
from autovfx_tpu.physics import solver as S
from autovfx_tpu.physics.shapes import (
    ConvexHullShape,
    MeshGrid,
    build_hulls,
    build_mesh_grid,
)


class RigidWorld:
    """Host-facing container; the heavy state lives in jittable pytrees."""

    def __init__(
        self,
        shape: ConvexHullShape,
        params: S.BodyParams,
        init_state: S.BodyState,
        grid: Optional[MeshGrid],
        cfg: S.SolverConfig,
        names: list[str],
        scales: np.ndarray,
        com_offsets: np.ndarray,
    ):
        self.shape = shape
        self.params = params
        self.state = init_state
        self.grid = grid
        self.cfg = cfg
        self.names = names
        self.scales = scales  # per-body uniform scale (for rb_transform)
        self.com_offsets = com_offsets  # mesh-origin -> COM (world scale)

    @classmethod
    def from_objects(
        cls,
        objects: list[dict],
        object_vertices: list[np.ndarray],
        scene_vertices: Optional[np.ndarray] = None,
        scene_faces: Optional[np.ndarray] = None,
        cfg: S.SolverConfig = S.SolverConfig(),
    ) -> "RigidWorld":
        """Build from edit-IR object dicts (edit_utils.get_default_object_info
        schema: pos, rot(euler xyz), scale, rigid_body{rb_type, mass,
        restitution}) plus their mesh vertices (object local frame).
        """
        from autovfx_tpu.core.quaternion import euler_to_rotmat

        b = len(objects)
        hull_pts = []
        poss, quats, scales = [], [], []
        mass, rest, rb_type, enabled = [], [], [], []
        names = []
        for obj, verts in zip(objects, object_vertices):
            s = float(obj.get("scale", 1.0))
            hull_pts.append(np.asarray(verts) * s)
            # edit-IR objects carry 'rot' as a 3x3 matrix
            # (edit_utils.get_default_object_info); euler triples are the
            # rb_transform convention — accept both
            r_in = np.asarray(obj.get("rot", np.eye(3)), np.float32)
            if r_in.shape == (3, 3):
                rot = r_in
            else:
                rot = np.asarray(
                    euler_to_rotmat(*[jnp.float32(r) for r in r_in])
                )
            quats.append(np.asarray(rotmat_to_quat(jnp.asarray(rot))))
            poss.append(np.asarray(obj.get("pos", [0.0, 0.0, 0.0]),
                                   np.float32))
            scales.append(s)
            rb = obj.get("rigid_body") or {}
            mass.append(float(rb.get("mass", 1.0)))
            rest.append(float(rb.get("restitution", 0.6)))
            t = str(rb.get("rb_type", "ACTIVE")).upper()
            rb_type.append(
                {"ACTIVE": S.RB_ACTIVE, "PASSIVE": S.RB_PASSIVE,
                 "KINEMATIC": S.RB_KINEMATIC}[t]
            )
            enabled.append(bool(obj.get("allow_physics", True)))
            names.append(obj.get("object_id", obj.get("object_name", "obj")))

        shape, coms, vols, inertias = build_hulls(hull_pts)

        # body state positions are COM positions: world_com = pos + R·com
        poss = np.stack(poss)
        quats_np = np.stack(quats)
        rots = np.asarray(quat_to_rotmat(jnp.asarray(quats_np)))
        world_com = poss + np.einsum("bij,bj->bi", rots, coms)

        rb_type = np.array(rb_type, np.int32)
        mass = np.array(mass, np.float32)
        inv_mass = np.where(rb_type == S.RB_ACTIVE, 1.0 / mass, 0.0)

        params = S.BodyParams(
            mass=jnp.asarray(mass),
            inv_mass=jnp.asarray(inv_mass.astype(np.float32)),
            inertia_body=jnp.asarray(inertias),
            restitution=jnp.asarray(np.array(rest, np.float32)),
            friction=jnp.asarray(np.full((b,), 0.5, np.float32)),
            rb_type=jnp.asarray(rb_type),
            enabled=jnp.asarray(np.array(enabled)),
        )
        state = S.BodyState(
            pos=jnp.asarray(world_com.astype(np.float32)),
            quat=jnp.asarray(quats_np.astype(np.float32)),
            linvel=jnp.zeros((b, 3)),
            angvel=jnp.zeros((b, 3)),
            asleep=jnp.zeros((b,), bool),
            low_vel_count=jnp.zeros((b,), jnp.int32),
        )
        grid = None
        if scene_vertices is not None:
            grid = build_mesh_grid(scene_vertices, scene_faces)
        return cls(
            shape, params, state, grid, cfg, names,
            np.array(scales, np.float32), coms.astype(np.float32),
        )


def simulate(
    world: RigidWorld,
    num_frames: int,
    enabled_schedule=None,
    kinematic=None,
    return_impacts: bool = False,
):
    """Run the jitted frame loop; returns per-frame (pos, quat) plus the
    final BodyState.  pos/quat are COM trajectories (F, B, ...).

    ``return_impacts``: also return (F, B) per-frame max contact approach
    speed per body — the collision-triggered-fracture signal (the
    reference's per-frame BVH overlap check, all_rendering.py:2394-2423).

    ``enabled_schedule``: optional (frames, bodies) bool — per-frame
    physics on/off from the event system (edit/events.py), replacing the
    reference's per-frame Blender event handler
    (all_rendering.py:2028-2060).

    ``kinematic``: optional {body_index: (pos (F,3), rot (F,3,3))} from
    physics/animation.kinematic_schedule — bodies follow the prescribed
    trajectory (FOLLOW_PATH analog) with velocities derived per frame so
    they push ACTIVE bodies through the contact solver.
    """
    cfg = world.cfg
    shape, params, grid = world.shape, world.params, world.grid
    b = world.state.pos.shape[0]
    if enabled_schedule is None:
        sched = jnp.broadcast_to(
            params.enabled[None, :], (num_frames, b)
        )
    else:
        sched = jnp.asarray(np.asarray(enabled_schedule, bool))

    kin_mask = np.zeros((b,), bool)
    kin_pos = np.zeros((num_frames, b, 3), np.float32)
    kin_quat = np.zeros((num_frames, b, 4), np.float32)
    kin_quat[..., 0] = 1.0
    if kinematic:
        for i, (pos_f, rot_f) in kinematic.items():
            kin_mask[i] = True
            rots = jnp.asarray(np.asarray(rot_f, np.float32))
            qs = np.asarray(rotmat_to_quat(rots))
            # prescribe the COM trajectory: com = pos + R·com_offset
            com = pos_f + np.einsum(
                "fij,j->fi", np.asarray(rot_f), world.com_offsets[i]
            )
            kin_pos[:, i] = com[:num_frames]
            kin_quat[:, i] = qs[:num_frames]
    kin_mask_j = jnp.asarray(kin_mask)
    kin_pos_j = jnp.asarray(kin_pos)
    kin_quat_j = jnp.asarray(kin_quat)
    # next-frame targets for velocity derivation
    kin_pos_next = jnp.concatenate([kin_pos_j[1:], kin_pos_j[-1:]], axis=0)

    @jax.jit
    def run(state, sched):
        def frame(state, inputs):
            enabled_f, pos_f, quat_f, pos_next = inputs
            params_f = params.replace(enabled=enabled_f)
            if bool(np.any(kin_mask)):
                vel_kin = (pos_next - pos_f) * cfg.fps
                m = kin_mask_j[:, None]
                state = state.replace(
                    pos=jnp.where(m, pos_f, state.pos),
                    quat=jnp.where(m, quat_f, state.quat),
                    linvel=jnp.where(m, vel_kin, state.linvel),
                    angvel=jnp.where(m, 0.0, state.angvel),
                    asleep=state.asleep & ~kin_mask_j,
                )

            def sub(s, _):
                s2, impact = S.substep(shape, s, params_f, grid, cfg)
                return s2, impact

            state, impacts = jax.lax.scan(
                sub, state, None, length=cfg.substeps_per_frame
            )
            return state, (state.pos, state.quat, impacts.max(axis=0))

        final, traj = jax.lax.scan(
            frame, state, (sched, kin_pos_j, kin_quat_j, kin_pos_next)
        )
        return final, traj

    final, (pos, quat, impacts) = run(world.state, sched)
    if return_impacts:
        return final, np.asarray(pos), np.asarray(quat), np.asarray(impacts)
    return final, np.asarray(pos), np.asarray(quat)


def rb_transform_schema(
    world: RigidWorld, pos: np.ndarray, quat: np.ndarray
) -> dict:
    """Emit the Blender rb_transform dict (all_rendering.py:2560-2573):
    {object_id: {frame_idx(str): {pos, rot (xyz euler, radians), scale}}}.

    Positions are converted back from COM to mesh-origin positions.
    """
    f, b = pos.shape[0], pos.shape[1]
    rots = np.asarray(quat_to_rotmat(jnp.asarray(quat.reshape(-1, 4)))).reshape(
        f, b, 3, 3
    )
    out = {}
    for i, name in enumerate(world.names):
        frames = {}
        for t in range(f):
            r = rots[t, i]
            origin = pos[t, i] - r @ world.com_offsets[i]
            # xyz euler from matrix (Blender convention)
            sy = -r[2, 0]
            cy = np.sqrt(max(1.0 - sy * sy, 0.0))
            if cy > 1e-6:
                rx = np.arctan2(r[2, 1], r[2, 2])
                ry = np.arcsin(np.clip(sy, -1, 1))
                rz = np.arctan2(r[1, 0], r[0, 0])
            else:
                rx = np.arctan2(-r[1, 2], r[1, 1])
                ry = np.arcsin(np.clip(sy, -1, 1))
                rz = 0.0
            frames[str(t)] = {
                "pos": [float(x) for x in origin],
                "rot": [float(rx), float(ry), float(rz)],
                "scale": [float(world.scales[i])] * 3,
            }
        out[name] = frames
    return out
