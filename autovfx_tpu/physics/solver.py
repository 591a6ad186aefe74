"""Jitted impulse-based rigid-body solver (replaces Blender's Bullet step).

Parity target: the Bullet configuration AutoVFX uses —
``all_rendering.py:794-818`` (restitution 0.6, collision margin 1e-3,
Bullet default friction 0.5), world stepped by ``scene.frame_set`` at
fps 15 with Bullet defaults (60 substeps/s, 10 solver iterations),
gravity (0, 0, -9.81), CONVEX_HULL actives vs a PASSIVE MESH scene
collider (:2328).

TPU-first: all bodies advance in lockstep inside ``lax.scan``; contacts
are fixed-budget vertex-based manifolds (hull-vertex↔scene-mesh via a
uniform-grid closest-triangle query, hull-vertex↔hull via signed
plane distance both ways), solved with iterated sequential-impulse
sweeps (Jacobi over contacts inside a ``fori_loop``, like Bullet's PGS
but batch-updated), with split restitution/friction impulses and
Baumgarte positional correction.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.struct
import jax
import jax.numpy as jnp

from autovfx_tpu.core.quaternion import (
    quat_integrate,
    quat_rotate,
    quat_to_rotmat,
)
from autovfx_tpu.physics.shapes import ConvexHullShape, MeshGrid, mesh_contact_query

GRAVITY = jnp.array([0.0, 0.0, -9.81])

# rb_type codes (edit IR `rigid_body.rb_type`)
RB_ACTIVE = 0
RB_PASSIVE = 1
RB_KINEMATIC = 2


@flax.struct.dataclass
class BodyState:
    pos: jax.Array  # (B, 3) center of mass, world
    quat: jax.Array  # (B, 4) wxyz
    linvel: jax.Array  # (B, 3)
    angvel: jax.Array  # (B, 3) world frame
    asleep: jax.Array  # (B,) bool (Bullet-style deactivation)
    low_vel_count: jax.Array  # (B,) int32 consecutive low-velocity substeps


@flax.struct.dataclass
class BodyParams:
    mass: jax.Array  # (B,)
    inv_mass: jax.Array  # (B,) 0 for non-active
    inertia_body: jax.Array  # (B, 3, 3) unit-mass inertia (body frame)
    restitution: jax.Array  # (B,)
    friction: jax.Array  # (B,)
    rb_type: jax.Array  # (B,) int32
    enabled: jax.Array  # (B,) bool — physics on (events can toggle)


@flax.struct.dataclass
class SolverConfig:
    substeps_per_frame: int = flax.struct.field(pytree_node=False, default=4)
    fps: float = flax.struct.field(pytree_node=False, default=15.0)
    solver_iterations: int = flax.struct.field(pytree_node=False, default=10)
    collision_margin: float = flax.struct.field(
        pytree_node=False, default=1e-3
    )
    baumgarte: float = flax.struct.field(pytree_node=False, default=0.2)
    slop: float = flax.struct.field(pytree_node=False, default=1e-3)
    restitution_threshold: float = flax.struct.field(
        pytree_node=False, default=0.5
    )  # Bullet: no bounce below this approach speed
    # Bullet/Blender deactivation thresholds (linear 0.4, angular 0.5,
    # after ~0.5 s of rest)
    sleep_lin: float = flax.struct.field(pytree_node=False, default=0.4)
    sleep_ang: float = flax.struct.field(pytree_node=False, default=0.5)
    sleep_substeps: int = flax.struct.field(pytree_node=False, default=30)
    wake_speed: float = flax.struct.field(pytree_node=False, default=0.5)
    # speculative contact distance: contacts activate within this range
    # and the velocity solve only removes approach speed that would
    # penetrate within one substep (kills resting jitter)
    speculative: float = flax.struct.field(pytree_node=False, default=0.05)


class Contacts(NamedTuple):
    body_a: jax.Array  # (K,) int32 — body receiving +normal impulse
    body_b: jax.Array  # (K,) int32 — other body (-1 = static scene)
    point: jax.Array  # (K, 3) world contact point
    normal: jax.Array  # (K, 3) from b (or scene) toward a
    depth: jax.Array  # (K,) penetration (>0 means interpenetrating)
    valid: jax.Array  # (K,)


def _world_verts(shape: ConvexHullShape, state: BodyState):
    """(B, V, 3) hull vertices in world space."""
    rot = quat_to_rotmat(state.quat)  # (B, 3, 3)
    return (
        jnp.einsum("bij,bvj->bvi", rot, shape.verts) + state.pos[:, None, :]
    )


def gen_scene_contacts(
    shape: ConvexHullShape,
    state: BodyState,
    params: BodyParams,
    grid: MeshGrid,
    margin: float,
    speculative: float = 0.05,
):
    """Hull-vertex vs scene-mesh contacts (one candidate per vertex)."""
    b, v, _ = shape.verts.shape
    wv = _world_verts(shape, state).reshape(b * v, 3)
    dist, normal, _ = mesh_contact_query(grid, wv)
    active = (
        (params.rb_type == RB_ACTIVE) & params.enabled & ~state.asleep
    )
    mask = (
        shape.vert_mask.reshape(-1)
        & jnp.repeat(active, v)
        & (dist < margin + speculative)
        & jnp.isfinite(dist)
    )
    depth = margin - dist  # negative => speculative (not yet touching)
    body_a = jnp.repeat(jnp.arange(b, dtype=jnp.int32), v)
    return Contacts(
        body_a=body_a,
        body_b=jnp.full((b * v,), -1, jnp.int32),
        point=wv,
        normal=normal,
        depth=jnp.where(mask, depth, 0.0),
        valid=mask,
    )


def gen_pair_contacts(
    shape: ConvexHullShape,
    state: BodyState,
    params: BodyParams,
    margin: float,
    contact_tol: float = 0.05,
):
    """Hull-hull contacts via face-normal SAT + deepest-vertex manifolds.

    For each ordered pair (a, b): the separation along each face plane f
    of b is ``face_sep[a,b,f] = min_v (n_f·v_a − d_f)``; SAT says the
    hulls overlap iff the *maximum* face separation over the faces of
    BOTH hulls is below the margin, and the best axis is that argmax
    (least-penetration face).  Contacts are the vertices of a within
    ``contact_tol`` of the deepest vertex along b's best face — this
    produces correct face-face manifolds (e.g. exactly stacked boxes)
    where naive per-vertex max-plane selection resolves along side faces.
    Edge-edge SAT axes are omitted (box-on-edge cases are approximate,
    like most game-engine hull solvers without edge clipping).
    """
    b, v, _ = shape.verts.shape
    wv = _world_verts(shape, state)  # (B, V, 3)
    rot = quat_to_rotmat(state.quat)
    # world planes of every body: n_w = R n, d_w = d + n_w·pos
    n_w = jnp.einsum("bij,bfj->bfi", rot, shape.planes[..., :3])
    d_w = shape.planes[..., 3] + jnp.einsum("bfi,bi->bf", n_w, state.pos)

    # sd[a, b, v, f] = signed distance of a's vertex v to b's plane f
    sd = (
        jnp.einsum("bfi,avi->abvf", n_w, wv) - d_w[None, :, None, :]
    )
    sd = jnp.where(shape.vert_mask[:, None, :, None], sd, jnp.inf)
    face_sep = jnp.min(sd, axis=2)  # (A, B, F): min over a's verts
    face_sep = jnp.where(shape.plane_mask[None, :, :], face_sep, -jnp.inf)
    sep_ab = jnp.max(face_sep, axis=-1)  # (A, B) best axis from b's faces
    best_f = jnp.argmax(face_sep, axis=-1)  # (A, B)
    sep_pair = jnp.maximum(sep_ab, sep_ab.T)  # full SAT over both hulls

    # prune: same body, sphere distance, inactive pairs
    ids = jnp.arange(b)
    same = ids[:, None] == ids[None, :]
    center_d = jnp.linalg.norm(
        state.pos[:, None] - state.pos[None, :], axis=-1
    )
    sphere_ok = center_d < (
        shape.radius[:, None] + shape.radius[None, :] + margin
    )
    movable = (params.rb_type == RB_ACTIVE) & params.enabled
    either_active = movable[:, None] | movable[None, :]
    collidable = (
        params.enabled[:, None]
        & params.enabled[None, :]
        & (~state.asleep[:, None] | ~state.asleep[None, :])
    )
    pair_ok = (~same) & sphere_ok & either_active & collidable
    touching = (sep_pair < margin + contact_tol) & pair_ok
    # generate from the (a, b) orientation whose axis won (ties: both)
    use_ab = touching & (sep_ab >= sep_ab.T)

    sd_best = jnp.take_along_axis(
        sd, best_f[:, :, None, None], axis=-1
    )[..., 0]  # (A, B, V): each vertex's distance along b's best face
    mask = (
        use_ab[:, :, None]
        & (sd_best <= sep_ab[:, :, None] + contact_tol)
        & (sd_best < margin + contact_tol)
        & shape.vert_mask[:, None, :]
    )  # (A, B, V)

    a_idx = jnp.arange(b)[:, None, None]
    b_idx = jnp.arange(b)[None, :, None]
    normal = n_w[b_idx, best_f[:, :, None]]  # (A, B, 1→V, 3) face normal of b
    normal = jnp.broadcast_to(normal, (b, b, v, 3))
    # normal points out of b => from b toward a ✓
    depth = jnp.where(mask, margin - sd_best, 0.0)

    body_a = jnp.broadcast_to(a_idx, (b, b, v)).reshape(-1).astype(jnp.int32)
    body_b = jnp.broadcast_to(b_idx, (b, b, v)).reshape(-1).astype(jnp.int32)
    return Contacts(
        body_a=body_a,
        body_b=body_b,
        point=jnp.broadcast_to(wv[:, None], (b, b, v, 3)).reshape(-1, 3),
        normal=normal.reshape(-1, 3),
        depth=depth.reshape(-1),
        valid=mask.reshape(-1),
    )


def _inv_inertia_world(params: BodyParams, state: BodyState):
    rot = quat_to_rotmat(state.quat)
    i_body = params.inertia_body * params.mass[:, None, None]
    i_world = rot @ i_body @ jnp.swapaxes(rot, -1, -2)
    # guarded inverse; non-active bodies get zeros
    inv = jnp.linalg.inv(
        i_world + 1e-9 * jnp.eye(3)[None]
    ) * (params.inv_mass > 0)[:, None, None]
    return inv


def solve_velocities(
    contacts: Contacts,
    state: BodyState,
    params: BodyParams,
    cfg: SolverConfig,
    dt: float,
):
    """Iterated impulse solve (normal + Coulomb friction), batch-Jacobi."""
    inv_i = _inv_inertia_world(params, state)
    k = contacts.valid.shape[0]
    a = contacts.body_a
    b_raw = contacts.body_b
    is_static = b_raw < 0
    b = jnp.maximum(b_raw, 0)

    ra = contacts.point - state.pos[a]
    rb = contacts.point - state.pos[b]
    n = contacts.normal
    inv_ma = params.inv_mass[a]
    inv_mb = jnp.where(is_static, 0.0, params.inv_mass[b])
    inv_ia = inv_i[a]
    inv_ib = jnp.where(is_static[:, None, None], 0.0, inv_i[b])

    # kinematic bodies: infinite mass but prescribed velocity (handled by
    # their linvel entering rel velocity with inv_mass = 0)

    # Jacobi mass-splitting: redundant manifolds (30 sphere vertices on
    # the ground at once) make plain Jacobi diverge; scaling each body's
    # effective compliance by its contact count restores contraction.
    n_bodies_ms = state.pos.shape[0]
    vf = contacts.valid.astype(jnp.float32)
    cnt = jnp.zeros((n_bodies_ms + 1,), jnp.float32)
    cnt = cnt.at[a].add(vf)
    cnt = cnt.at[jnp.where(is_static, n_bodies_ms, b)].add(vf)
    cnt_a = jnp.maximum(cnt[a], 1.0)
    cnt_b = jnp.maximum(jnp.where(is_static, 1.0, cnt[jnp.minimum(b, n_bodies_ms - 1)]), 1.0)

    def k_normal(axis):
        ta = jnp.cross(ra, axis)
        tb = jnp.cross(rb, axis)
        term_a = inv_ma + jnp.sum(
            ta * jnp.einsum("kij,kj->ki", inv_ia, ta), -1
        )
        term_b = inv_mb + jnp.sum(
            tb * jnp.einsum("kij,kj->ki", inv_ib, tb), -1
        )
        return cnt_a * term_a + cnt_b * term_b

    kn = jnp.maximum(k_normal(n), 1e-9)

    # restitution from pre-solve approach speed (Bullet style)
    def rel_vel(linvel, angvel):
        va = linvel[a] + jnp.cross(angvel[a], ra)
        vb = jnp.where(
            is_static[:, None],
            0.0,
            linvel[b] + jnp.cross(angvel[b], rb),
        )
        return va - vb

    v0 = rel_vel(state.linvel, state.angvel)
    vn0 = jnp.sum(v0 * n, -1)
    # Bullet combines restitution multiplicatively; the PASSIVE scene mesh
    # is added with the same 0.6 default (all_rendering.py:794,2328)
    rest = params.restitution[a] * jnp.where(
        is_static, 0.6, params.restitution[b]
    )
    bounce = jnp.where(
        -vn0 > cfg.restitution_threshold, -rest * vn0, 0.0
    )
    # split-impulse: penetration is fixed by a separate positional pass
    # (position_correction), so the velocity solve never injects energy.
    # Speculative contacts (negative depth = gap) may approach at up to
    # gap/dt — they stop exactly at touch instead of jittering.
    gap = jnp.maximum(-contacts.depth, 0.0)
    target = jnp.where(bounce > 0.0, bounce, -gap / dt)

    fric = jnp.sqrt(
        params.friction[a] * jnp.where(is_static, 0.5, params.friction[b])
    )

    # friction tangent basis
    t1 = jnp.cross(n, jnp.where(
        (jnp.abs(n[:, 2:3]) < 0.9), jnp.array([0.0, 0.0, 1.0]),
        jnp.array([1.0, 0.0, 0.0]),
    ))
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    kt1 = jnp.maximum(k_normal(t1), 1e-9)
    kt2 = jnp.maximum(k_normal(t2), 1e-9)

    n_bodies = state.pos.shape[0]
    valid_f = contacts.valid.astype(jnp.float32)

    def apply_impulses(linvel, angvel, imp):
        """Scatter-add ±impulses to bodies."""
        dv_a = imp * inv_ma[:, None]
        dw_a = jnp.einsum("kij,kj->ki", inv_ia, jnp.cross(ra, imp))
        dv_b = -imp * inv_mb[:, None]
        dw_b = -jnp.einsum("kij,kj->ki", inv_ib, jnp.cross(rb, imp))
        linvel = linvel.at[a].add(dv_a)
        angvel = angvel.at[a].add(dw_a)
        b_safe = jnp.where(is_static, n_bodies, b)
        linvel = jnp.concatenate(
            [linvel, jnp.zeros((1, 3))], 0
        ).at[b_safe].add(dv_b)[:n_bodies]
        angvel = jnp.concatenate(
            [angvel, jnp.zeros((1, 3))], 0
        ).at[b_safe].add(dw_b)[:n_bodies]
        return linvel, angvel

    def iteration(_, carry):
        linvel, angvel, pn_acc, pt1_acc, pt2_acc = carry
        v = rel_vel(linvel, angvel)
        vn = jnp.sum(v * n, -1)
        dpn = (target - vn) / kn * valid_f
        pn_new = jnp.maximum(pn_acc + dpn, 0.0)
        dpn = pn_new - pn_acc

        vt1 = jnp.sum(v * t1, -1)
        vt2 = jnp.sum(v * t2, -1)
        dpt1 = -vt1 / kt1 * valid_f
        dpt2 = -vt2 / kt2 * valid_f
        max_f = fric * pn_new
        pt1_new = jnp.clip(pt1_acc + dpt1, -max_f, max_f)
        pt2_new = jnp.clip(pt2_acc + dpt2, -max_f, max_f)
        dpt1 = pt1_new - pt1_acc
        dpt2 = pt2_new - pt2_acc

        imp = (
            dpn[:, None] * n + dpt1[:, None] * t1 + dpt2[:, None] * t2
        )
        pn_acc = pn_acc + dpn
        pt1_acc = pt1_acc + dpt1
        pt2_acc = pt2_acc + dpt2
        linvel, angvel = apply_impulses(linvel, angvel, imp)
        return linvel, angvel, pn_acc, pt1_acc, pt2_acc

    zero_k = jnp.zeros((k,), jnp.float32)
    linvel, angvel, *_ = jax.lax.fori_loop(
        0,
        cfg.solver_iterations,
        iteration,
        (state.linvel, state.angvel, zero_k, zero_k, zero_k),
    )
    # non-active bodies keep their prescribed velocities
    active = (params.rb_type == RB_ACTIVE) & params.enabled
    linvel = jnp.where(active[:, None], linvel, state.linvel)
    angvel = jnp.where(active[:, None], angvel, state.angvel)

    # per-body impact speed: max pre-solve approach speed over this
    # body's valid contacts.  Resting contacts approach at ~0, so this
    # cleanly separates impacts (used for collision-triggered fracture,
    # the BVH-overlap trigger of all_rendering.py:2394-2423).
    approach = jnp.where(contacts.valid, jnp.maximum(-vn0, 0.0), 0.0)
    impact = jnp.zeros((n_bodies,), jnp.float32)
    impact = impact.at[a].max(approach)
    b_safe2 = jnp.where(is_static, 0, b)
    impact = impact.at[b_safe2].max(jnp.where(is_static, 0.0, approach))
    return state.replace(linvel=linvel, angvel=angvel), impact


def position_correction(
    contacts: Contacts,
    state: BodyState,
    params: BodyParams,
    cfg: SolverConfig,
    iters: int = 4,
):
    """Split-impulse positional projection (linear-only pseudo-impulses).

    Resolves remaining penetration without adding kinetic energy
    (Bullet's btContactSolverInfo::m_splitImpulse behavior).
    """
    n_bodies = state.pos.shape[0]
    a = contacts.body_a
    b_raw = contacts.body_b
    is_static = b_raw < 0
    b = jnp.maximum(b_raw, 0)
    n = contacts.normal
    inv_ma = params.inv_mass[a]
    inv_mb = jnp.where(is_static, 0.0, params.inv_mass[b])
    k = jnp.maximum(inv_ma + inv_mb, 1e-9)
    valid_f = contacts.valid.astype(jnp.float32)

    def it_fn(_, dpos):
        sep = jnp.sum((dpos[a] - jnp.where(
            is_static[:, None], 0.0, dpos[b]
        )) * n, -1)
        depth_now = contacts.depth - sep
        p = (
            cfg.baumgarte
            * jnp.maximum(depth_now - cfg.slop, 0.0)
            / k
            * valid_f
        )
        dpos = dpos.at[a].add(0.7 * p[:, None] * n * inv_ma[:, None])
        b_safe = jnp.where(is_static, n_bodies, b)
        dpos = jnp.concatenate([dpos, jnp.zeros((1, 3))], 0).at[
            b_safe
        ].add(-0.7 * p[:, None] * n * inv_mb[:, None])[:n_bodies]
        return dpos

    dpos = jax.lax.fori_loop(
        0, iters, it_fn, jnp.zeros((n_bodies, 3), jnp.float32)
    )
    active = (params.rb_type == RB_ACTIVE) & params.enabled & ~state.asleep
    return state.replace(
        pos=state.pos + jnp.where(active[:, None], dpos, 0.0)
    )


def substep(
    shape: ConvexHullShape,
    state: BodyState,
    params: BodyParams,
    grid: MeshGrid | None,
    cfg: SolverConfig,
):
    dt = 1.0 / (cfg.fps * cfg.substeps_per_frame)
    active = (params.rb_type == RB_ACTIVE) & params.enabled & ~state.asleep

    # integrate gravity
    linvel = jnp.where(
        active[:, None], state.linvel + dt * GRAVITY[None], state.linvel
    )
    state = state.replace(linvel=linvel)

    # contacts
    contact_sets = []
    if grid is not None:
        contact_sets.append(
            gen_scene_contacts(shape, state, params, grid,
                               cfg.collision_margin, cfg.speculative)
        )
    contact_sets.append(
        gen_pair_contacts(shape, state, params, cfg.collision_margin,
                          cfg.speculative)
    )
    contacts = Contacts(
        body_a=jnp.concatenate([c.body_a for c in contact_sets]),
        body_b=jnp.concatenate([c.body_b for c in contact_sets]),
        point=jnp.concatenate([c.point for c in contact_sets]),
        normal=jnp.concatenate([c.normal for c in contact_sets]),
        depth=jnp.concatenate([c.depth for c in contact_sets]),
        valid=jnp.concatenate([c.valid for c in contact_sets]),
    )
    state, impact = solve_velocities(contacts, state, params, cfg, dt)
    state = position_correction(contacts, state, params, cfg)

    # ---- deactivation (Bullet sleeping) -------------------------------------
    # wake bodies hit by a fast-approaching contact
    n_bodies = state.pos.shape[0]
    va = state.linvel[contacts.body_a] + jnp.cross(
        state.angvel[contacts.body_a],
        contacts.point - state.pos[contacts.body_a],
    )
    b_safe = jnp.where(contacts.body_b < 0, 0, contacts.body_b)
    vb = jnp.where(
        (contacts.body_b < 0)[:, None],
        0.0,
        state.linvel[b_safe]
        + jnp.cross(
            state.angvel[b_safe], contacts.point - state.pos[b_safe]
        ),
    )
    vn_now = jnp.abs(jnp.sum((va - vb) * contacts.normal, -1))
    fast = contacts.valid & (vn_now > cfg.wake_speed)
    wake = jnp.zeros((n_bodies,), bool)
    wake = wake.at[jnp.where(fast, contacts.body_a, 0)].max(fast)
    wake = wake.at[jnp.where(fast & (contacts.body_b >= 0), b_safe, 0)].max(
        fast & (contacts.body_b >= 0)
    )

    low = (jnp.linalg.norm(state.linvel, axis=-1) < cfg.sleep_lin) & (
        jnp.linalg.norm(state.angvel, axis=-1) < cfg.sleep_ang
    )
    count = jnp.where(low & ~wake, state.low_vel_count + 1, 0)
    asleep = (state.asleep & ~wake) | (count >= cfg.sleep_substeps)
    zero_v = asleep[:, None]
    state = state.replace(
        linvel=jnp.where(zero_v, 0.0, state.linvel),
        angvel=jnp.where(zero_v, 0.0, state.angvel),
        asleep=asleep,
        low_vel_count=count,
    )

    # integrate positions (kinematic bodies follow their animation velocity)
    movable = ((params.rb_type == RB_ACTIVE) | (params.rb_type == RB_KINEMATIC)) & params.enabled & ~state.asleep
    pos = jnp.where(movable[:, None], state.pos + dt * state.linvel, state.pos)
    quat = jnp.where(
        movable[:, None],
        quat_integrate(state.quat, state.angvel, dt),
        state.quat,
    )
    return state.replace(pos=pos, quat=quat), impact
