"""Melting & incineration effects on surfel objects.

Parity target (approximate): Blender's melting path — Mantaflow LIQUID
domain with per-frame melted-mesh exports (all_rendering.py:1649-1817,
:2575-2585) — and the incinerate burn-to-black material keyframes
(:1408-1457).

TPU-first approximation: instead of a full FLIP liquid solve, melting is
a surfel-space deformation schedule — points sink toward the ground
plane, spread radially (volume-ish preserving), and merge into a puddle
disc; incineration darkens the albedo toward char and fades opacity.
Both are pure functions of (surfels, progress∈[0,1]) applied before
IBL shading, so they compose with physics transforms and the standard
object pass.
"""
from __future__ import annotations

import numpy as np


def melt_surfels(
    points: np.ndarray,
    normals: np.ndarray,
    progress: float,
    ground_z: float | None = None,
    spread: float = 1.6,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Deform object-local surfels toward a puddle.

    Returns (points, normals, radius_scale).  progress 0 = intact,
    1 = fully melted puddle.
    """
    p = float(np.clip(progress, 0.0, 1.0))
    pts = np.asarray(points, np.float32).copy()
    if ground_z is None:
        ground_z = float(pts[:, 2].min())
    h = pts[:, 2] - ground_z
    # height collapses, base spreads; higher points collapse first
    squash = 1.0 - p * (0.85 + 0.1 * (h / max(h.max(), 1e-6)))
    pts[:, 2] = ground_z + h * np.clip(squash, 0.05, 1.0)
    center_xy = pts[:, :2].mean(0)
    pts[:, :2] = center_xy + (pts[:, :2] - center_xy) * (
        1.0 + (spread - 1.0) * p
    )
    # normals flatten toward +z as the surface becomes a puddle
    n = np.asarray(normals, np.float32).copy()
    up = np.array([0, 0, 1], np.float32)
    n = (1 - p) * n + p * up[None]
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-9)
    radius_scale = 1.0 + 0.6 * p  # surfels widen to close gaps
    return pts, n, radius_scale


def melt_gaussians(g, progress: float, ground_z: float | None = None,
                   spread: float = 1.6):
    """Melt a 3DGS-extracted object by deforming its splats directly.

    The reference exports per-frame melted meshes from the Mantaflow
    LIQUID sim and re-associates the object's scene Gaussians to them
    (reference scene_representation.py:372-421 match_gaussians_to_mesh);
    here the same puddle deformation field as ``melt_surfels`` is
    applied to the splat centers, and each splat's scales are updated by
    the field's (diagonal) Jacobian rotated into the splat frame —
    jit-friendly, no host round trip.
    """
    import jax.numpy as jnp

    from autovfx_tpu.core.quaternion import quat_to_rotmat

    p = float(np.clip(progress, 0.0, 1.0))
    if p == 0.0:
        return g
    xyz = g.xyz
    if ground_z is None:
        ground_z = float(jnp.min(xyz[:, 2]))
    h = xyz[:, 2] - ground_z
    h_max = jnp.maximum(jnp.max(h), 1e-6)
    squash = jnp.clip(1.0 - p * (0.85 + 0.1 * (h / h_max)), 0.05, 1.0)
    z_new = ground_z + h * squash
    center_xy = jnp.mean(xyz[:, :2], axis=0)
    sxy = 1.0 + (spread - 1.0) * p
    xy_new = center_xy + (xyz[:, :2] - center_xy) * sxy
    xyz_new = jnp.concatenate([xy_new, z_new[:, None]], axis=-1)

    # world-diagonal Jacobian diag(sxy, sxy, sz) → per-splat local-axis
    # factors f_j = sqrt(Σ_k J_kk² R_kj²) (diagonal of RᵀJ²R)
    R = quat_to_rotmat(g.rotations)  # (N, 3, 3) columns = local axes
    j2 = jnp.stack(
        [jnp.full_like(squash, sxy**2),
         jnp.full_like(squash, sxy**2), squash**2], axis=-1
    )  # (N, 3)
    f = jnp.sqrt(
        jnp.maximum(jnp.einsum("nk,nkj->nj", j2, R**2), 1e-12)
    )
    return g.replace(
        xyz=xyz_new,
        log_scales=g.log_scales + jnp.log(f),
    )


def incinerate_gaussians(g, progress: float):
    """Burn-to-black + ash fade on a splat object (DC-band darkening +
    opacity ramp, matching ``incinerate_colors`` semantics)."""
    import jax.numpy as jnp

    from autovfx_tpu.core.sh import C0, rgb_to_sh

    p = float(np.clip(progress, 0.0, 1.0))
    if p == 0.0:
        return g
    char = jnp.array([0.05, 0.04, 0.035], jnp.float32)
    rgb = g.sh_dc * C0 + 0.5  # DC-band color
    burned = (1 - 0.9 * p) * rgb + 0.9 * p * char[None]
    op_scale = 1.0 if p < 0.7 else max(1.0 - (p - 0.7) / 0.3, 1e-4)
    # fade via logit shift: sigmoid(x + log s) ≈ s·sigmoid(x) for small s
    return g.replace(
        sh_dc=rgb_to_sh(burned),
        sh_rest=g.sh_rest * (1.0 - 0.9 * p),
        opacity_logit=g.opacity_logit + float(np.log(op_scale)),
    )


def incinerate_colors(
    colors: np.ndarray, progress: float
) -> tuple[np.ndarray, float]:
    """Burn-to-black + ash fade (returns colors, opacity scale)."""
    p = float(np.clip(progress, 0.0, 1.0))
    char = np.array([0.05, 0.04, 0.035], np.float32)
    c = np.asarray(colors, np.float32)
    burned = (1 - 0.9 * p) * c + 0.9 * p * char[None]
    opacity_scale = 1.0 if p < 0.7 else float(1.0 - (p - 0.7) / 0.3)
    return burned, max(opacity_scale, 0.0)


def effect_progress(
    frame_idx: int, start_frame: int, end_frame: int | None,
    total_frames: int,
) -> float:
    """Linear progress of an event over its window (1-based frames)."""
    f0 = start_frame - 1
    f1 = (end_frame - 1) if end_frame else total_frames
    if frame_idx < f0:
        return 0.0
    return min((frame_idx - f0) / max(f1 - f0, 1), 1.0)
