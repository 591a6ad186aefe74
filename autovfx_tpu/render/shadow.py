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


def trim_hull_planes(planes, plane_mask, align: int = 8):
    """Host-side: drop all-padded trailing plane slots (build_hulls pads
    to 64 faces; a box hull uses ~6 — shadow cost is linear in the
    padded count).  Keeps a multiple of ``align`` slots."""
    import numpy as np

    mask = np.asarray(plane_mask)
    real = int(mask.sum(axis=1).max()) if mask.size else 0
    keep = min(max(-(-real // align) * align, align), mask.shape[1])
    return planes[:, :keep], plane_mask[:, :keep]


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
    scale: int = 1,
) -> jax.Array:
    """(H, W) shadow ratio in [0, 1]: 1 = fully lit, <1 = shadowed.

    ``scale`` > 1 evaluates the (low-frequency) ratio on a subsampled
    pixel grid and bilinearly upsamples — a 1/scale² cost cut.

    The per-(pixel, plane) slack ``d - n·p`` is hoisted out of the light
    loop (it is light-independent); each light then costs one divide +
    min/max reduction per plane instead of a fresh 3-dot projection.
    """
    full_hw = depth.shape
    if scale > 1:
        cam = cam.resized(scale)
        hs, ws = cam.height, cam.width
        # box-filter downsample via an aligned reshape-mean: a strided
        # [::s, ::s] slice forces a multi-ms lane relayout on TPU (it
        # costs MORE than computing the shadow at full resolution)
        h2, w2 = hs * scale, ws * scale
        depth = jnp.pad(
            depth, ((0, h2 - depth.shape[0]), (0, w2 - depth.shape[1])),
            mode="edge",
        ).reshape(hs, scale, ws, scale).mean(axis=(1, 3))
        alpha = jnp.pad(
            alpha, ((0, h2 - alpha.shape[0]), (0, w2 - alpha.shape[1])),
            mode="edge",
        ).reshape(hs, scale, ws, scale).mean(axis=(1, 3))

    # backproject pixels to world surface points
    z = depth / jnp.maximum(alpha, 1e-6)  # expected depth given coverage
    rays = cam.ray_directions()  # (H, W, 3) per-unit-view-z directions
    pts = cam.center[None, None, :] + rays * z[..., None]
    pts = pts + bias * _up_offset(rays)

    nrm = hull_planes[..., :3]  # (B, F, 3)
    dvec = hull_planes[..., 3]  # (B, F)
    denom_l = jnp.einsum("ki,bfi->kbf", light_dirs, nrm)  # (K, B, F)
    big = 1e30
    n_lights = light_dirs.shape[0]
    # light-independent (pixel, hull, plane) slack, hoisted once; with
    # trim_hull_planes applied the materialization is small (F <= ~16)
    dist = dvec[None, None] - jnp.einsum(
        "hwi,bfi->hwbf", pts, nrm
    )  # (H, W, B, F)

    # divides are ~8x slower than multiplies on the VPU and the
    # denominator is pixel-independent: one reciprocal per (light,
    # hull, plane), then a broadcast multiply over pixels
    inv_denom_l = 1.0 / jnp.where(
        jnp.abs(denom_l) > 1e-9, denom_l, 1e-9
    )

    def per_light(lit, k):
        denom = denom_l[k]  # (B, F)
        t_plane = dist * inv_denom_l[k]
        upper = jnp.where(denom > 1e-9, t_plane, big)
        lower = jnp.where(denom < -1e-9, t_plane, -big)
        always_out = (jnp.abs(denom) <= 1e-9) & (dist < 0)
        upper = jnp.where(always_out, -big, upper)
        upper = jnp.where(hull_mask, upper, big)
        lower = jnp.where(hull_mask, lower, -big)
        t_exit = jnp.min(upper, axis=-1)  # (H, W, B)
        t_enter = jnp.max(lower, axis=-1)
        hit = (t_exit > jnp.maximum(t_enter, 1e-4)) & (t_exit > 0)
        occ = jnp.any(hit, axis=-1)
        return lit + light_weights[k] * (~occ).astype(jnp.float32), None

    lit, _ = jax.lax.scan(
        per_light,
        jnp.zeros(pts.shape[:2], jnp.float32),
        jnp.arange(n_lights),
    )
    ratio = lit / jnp.maximum(jnp.sum(light_weights), 1e-9)
    if scale > 1:
        ratio = jax.image.resize(ratio, full_hw, method="bilinear")
    return ratio


def _up_offset(rays):
    # small offset along -ray (toward camera) to avoid self-occlusion
    return -rays * 1.0


def hull_object_weight(
    cam: Camera,
    scene_depth: jax.Array,  # (H, W) normalized front-surface depth
    hull_planes: jax.Array,  # (B, F, 4) world-frame planes
    hull_mask: jax.Array,  # (B, F)
    depth_tol: float = 0.05,
    pad: jax.Array | float = 0.0,
) -> jax.Array:
    """(H, W) binary object-visibility weight from hull projection.

    Replaces a full object-only rasterization in the fused edit path:
    a pixel shows the inserted object iff its view ray enters some hull
    BEFORE the merged scene surface.  With the camera as the common ray
    origin the per-plane slack is a scalar per hull, so the whole test
    is one (H, W, F) fused elementwise pass per hull — ~100x cheaper
    than the 50k-splat mini-rasterize it replaces (same machinery as
    the shadow rays; exact at the hull silhouette).
    """
    rays = cam.ray_directions()  # (H, W, 3), t parameter == view z
    big = 1e30

    def per_hull(w, b):
        n = hull_planes[b, :, :3]
        # ``pad`` expands the hull outward to absorb the splat-radius
        # bleed of the rendered surfels beyond the exact silhouette
        d = hull_planes[b, :, 3] + pad
        dist = d - n @ cam.center  # (F,)
        denom = jnp.einsum("hwi,fi->hwf", rays, n)
        t_plane = dist / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        upper = jnp.where(denom > 1e-9, t_plane, big)
        lower = jnp.where(denom < -1e-9, t_plane, -big)
        always_out = (jnp.abs(denom) <= 1e-9) & (dist < 0)
        upper = jnp.where(always_out, -big, upper)
        upper = jnp.where(hull_mask[b], upper, big)
        lower = jnp.where(hull_mask[b], lower, -big)
        t_exit = jnp.min(upper, axis=-1)
        t_enter = jnp.maximum(jnp.max(lower, axis=-1), 0.0)
        hit = (t_exit > jnp.maximum(t_enter, 1e-4)) & (t_exit > 0)
        # loose gate: the merged splat depth is biased vs the exact
        # hull plane by up to a few surfel radii — only exclude pixels
        # where the object is CLEARLY behind the scene surface
        visible = hit & (
            t_enter <= scene_depth * (1.0 + depth_tol) + depth_tol
        )
        return jnp.maximum(w, visible.astype(jnp.float32)), None

    w0 = jnp.zeros(scene_depth.shape, jnp.float32)
    w, _ = jax.lax.scan(per_hull, w0, jnp.arange(hull_planes.shape[0]))
    return w


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
