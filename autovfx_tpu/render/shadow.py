"""Shadow-catcher pass: envmap-visibility ratio on the scene surface.

Replaces the Cycles rgb_all / rgb_shadow quotient (blend_all.py:279-292
consumes it; produced by the 5-pass loop all_rendering.py:2440-2558, with
the scene mesh as a white shadow catcher :740-764).

TPU-first design: the only light blockers *added* by an edit are the
inserted objects, so the shadow ratio at a background pixel p is

    ratio(p) = Σ_k w_k · vis_k(p) / Σ_k w_k

over importance-sampled envmap directions k (weights w_k = luminance
contributions), where vis_k(p) is a ray-vs-convex-hull occlusion test
against every inserted object (slab test on the hull's face planes —
a handful of fused VPU ops per (pixel, ray, hull), no BVH needed).
Surface points come from backprojecting the 3DGS depth map.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from autovfx_tpu.core.cameras import Camera


def ray_hits_hull(
    origins: jax.Array,  # (..., 3)
    direction: jax.Array,  # (3,) or (..., 3)
    planes: jax.Array,  # (F, 4) world-frame hull planes n·x <= d
    plane_mask: jax.Array,  # (F,)
) -> jax.Array:
    """Boolean: does ray origin + t·direction (t>0) enter the hull?

    Slab test: for each plane, the ray is inside the half-space for an
    interval of t; the hull is hit iff the intersection of intervals
    [t_enter, t_exit] is non-empty with t_exit > max(t_enter, 0).
    """
    n = planes[:, :3]  # (F, 3)
    d = planes[:, 3]
    denom = jnp.einsum("...i,fi->...f", direction, n)  # (..., F)
    dist = d - jnp.einsum("...i,fi->...f", origins, n)  # (..., F) slack
    t_plane = dist / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
    # denom > 0: leaving constraint at t_plane (upper bound)
    # denom < 0: entering at t_plane (lower bound)
    # denom ≈ 0: always inside iff dist >= 0
    big = 1e30
    upper = jnp.where(denom > 1e-9, t_plane, big)
    lower = jnp.where(denom < -1e-9, t_plane, -big)
    always_out = (jnp.abs(denom) <= 1e-9) & (dist < 0)
    upper = jnp.where(always_out, -big, upper)
    upper = jnp.where(plane_mask, upper, big)
    lower = jnp.where(plane_mask, lower, -big)
    t_exit = jnp.min(upper, axis=-1)
    t_enter = jnp.max(lower, axis=-1)
    return (t_exit > jnp.maximum(t_enter, 1e-4)) & (t_exit > 0)


def world_hull_planes(planes_body, plane_mask, rot, pos):
    """Body-frame hull planes -> world frame for one body."""
    n_w = planes_body[:, :3] @ rot.T
    d_w = planes_body[:, 3] + n_w @ pos
    return jnp.concatenate([n_w, d_w[:, None]], axis=-1), plane_mask


def shadow_ratio_map(
    cam: Camera,
    depth: jax.Array,  # (H, W) alpha-weighted 3DGS depth (view z)
    alpha: jax.Array,  # (H, W) background coverage (for depth normalize)
    light_dirs: jax.Array,  # (K, 3) importance-sampled envmap directions
    light_weights: jax.Array,  # (K,) luminance weights
    hull_planes: jax.Array,  # (B, F, 4) world-frame hull planes
    hull_mask: jax.Array,  # (B, F)
    bias: float = 1e-2,
) -> jax.Array:
    """(H, W) shadow ratio in [0, 1]: 1 = fully lit, <1 = shadowed."""
    # backproject pixels to world surface points
    z = depth / jnp.maximum(alpha, 1e-6)  # expected depth given coverage
    rays = cam.ray_directions()  # (H, W, 3), unit-z-depth scaled below
    # rays are direction per unit view-z? ray_directions returns
    # cam-frame (x/fx, y/fy, 1) rotated to world => scale by view z.
    pts = cam.center[None, None, :] + rays * z[..., None]
    pts = pts + bias * _up_offset(rays)

    def occluded_by_any(direction):
        occ = jnp.zeros(pts.shape[:2], bool)
        def body(i, occ):
            hit = ray_hits_hull(
                pts, direction, hull_planes[i], hull_mask[i]
            )
            return occ | hit
        return jax.lax.fori_loop(0, hull_planes.shape[0], body, occ)

    def per_light(carry, k):
        lit_acc, wsum = carry
        d = light_dirs[k]
        w = light_weights[k]
        occ = occluded_by_any(d)
        lit_acc = lit_acc + w * (~occ).astype(jnp.float32)
        return (lit_acc, wsum + w), None

    (lit, wsum), _ = jax.lax.scan(
        per_light,
        (jnp.zeros(pts.shape[:2], jnp.float32), jnp.float32(0.0)),
        jnp.arange(light_dirs.shape[0]),
    )
    return lit / jnp.maximum(wsum, 1e-9)


def _up_offset(rays):
    # small offset along -ray (toward camera) to avoid self-occlusion
    return -rays * 1.0


def object_hulls_world(shape, state):
    """(B, F, 4) world planes + (B, F) masks from physics shapes/state."""
    from autovfx_tpu.core.quaternion import quat_to_rotmat

    rot = quat_to_rotmat(state.quat)  # (B, 3, 3)
    n_w = jnp.einsum("bij,bfj->bfi", rot, shape.planes[..., :3])
    d_w = shape.planes[..., 3] + jnp.einsum("bfi,bi->bf", n_w, state.pos)
    return (
        jnp.concatenate([n_w, d_w[..., None]], axis=-1),
        shape.plane_mask,
    )
