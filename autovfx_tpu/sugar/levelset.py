"""Level-surface point extraction from cameras.

Parity target: ``sugar_model.compute_level_surface_points_from_camera_fast``
(:1719-1955) with ``use_gaussian_depth=True`` (:1772-1784 — the splat
depth replaces the PyTorch3D mesh rasterizer): backproject each pixel,
sample 21 points over ±3σ (σ = β at the surface point) along the ray,
evaluate the density field, linearly interpolate the first crossing of
the 0.3 level, and get normals from the analytic density gradient.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from autovfx_tpu.core.cameras import Camera
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.ops.knn import knn_indices
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
from autovfx_tpu.sugar import density as D

N_SAMPLES = 21  # ray samples over ±3σ (sugar_model.py:1804-1886)
LEVEL = 0.3  # surface_level (sugar/train.py:38-47)


class LevelSetPoints(NamedTuple):
    points: jax.Array  # (P, 3)
    normals: jax.Array  # (P, 3)
    valid: jax.Array  # (P,) crossing found + coverage ok


def level_surface_from_camera(
    g: Gaussians,
    cam: Camera,
    config: RasterConfig = RasterConfig(),
    level: float = LEVEL,
    pixel_stride: int = 2,
    k: int = 16,
) -> LevelSetPoints:
    """Extract level-set samples seen from one camera."""
    out = rasterize(g, cam, config=config)
    alpha = out.alpha[::pixel_stride, ::pixel_stride]
    depth = (out.depth / jnp.maximum(out.alpha, 1e-6))[
        ::pixel_stride, ::pixel_stride
    ]
    rays = cam.ray_directions()[::pixel_stride, ::pixel_stride]
    origin = cam.center

    pts0 = origin + rays * depth[..., None]
    p = pts0.reshape(-1, 3)
    covered = (alpha > 0.5).reshape(-1)

    # β at the first-guess surface points -> ±3β sampling range
    nbrs0, _ = knn_indices(g.xyz, g.active, k=k)
    # neighbor list for arbitrary query points: nearest gaussian's list
    nearest_idx, _ = _nearest_gaussian(p, g)
    nbrs = nbrs0[nearest_idx]
    beta = D.compute_beta(p, nbrs, g)

    # 21 samples along the ray over ±3β around the splat depth
    ts = jnp.linspace(-3.0, 3.0, N_SAMPLES)
    ray_flat = rays.reshape(-1, 3)
    samples = (
        p[:, None, :] + ts[None, :, None] * beta[:, None, None] * ray_flat[:, None, :]
    )  # (P, 21, 3)
    dens = D.compute_density(
        samples.reshape(-1, 3), jnp.repeat(nbrs, N_SAMPLES, axis=0), g
    ).reshape(-1, N_SAMPLES)

    # first crossing of `level` front-to-back
    above = dens >= level
    first = jnp.argmax(above, axis=1)  # first index where density >= level
    has_crossing = jnp.any(above, axis=1) & (first > 0)
    i1 = jnp.clip(first, 1, N_SAMPLES - 1)
    i0 = i1 - 1
    d0 = jnp.take_along_axis(dens, i0[:, None], 1)[:, 0]
    d1 = jnp.take_along_axis(dens, i1[:, None], 1)[:, 0]
    w = jnp.clip((level - d0) / jnp.where(d1 != d0, d1 - d0, 1.0), 0.0, 1.0)
    p0 = jnp.take_along_axis(samples, i0[:, None, None].repeat(3, -1), 1)[:, 0]
    p1 = jnp.take_along_axis(samples, i1[:, None, None].repeat(3, -1), 1)[:, 0]
    surf = p0 + w[:, None] * (p1 - p0)

    grad = D.density_gradient(surf, nbrs, g)
    normals = -grad / jnp.maximum(
        jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9
    )
    # orient toward the camera
    to_cam = origin - surf
    flip = jnp.sum(normals * to_cam, axis=-1) < 0
    normals = jnp.where(flip[:, None], -normals, normals)

    return LevelSetPoints(
        points=surf, normals=normals, valid=covered & has_crossing
    )


def _nearest_gaussian(points: jax.Array, g: Gaussians):
    """Nearest active gaussian per query point via a joint Morton sort."""
    from autovfx_tpu.ops.knn import morton_codes

    n = g.xyz.shape[0]
    p = points.shape[0]
    all_pts = jnp.concatenate([g.xyz, points], axis=0)
    all_mask = jnp.concatenate([g.active, jnp.ones((p,), bool)])
    codes = morton_codes(all_pts, all_mask)
    # queries search the nearest gaussian among Morton neighbors
    is_g = jnp.concatenate([g.active, jnp.zeros((p,), bool)])
    order = jnp.argsort(jnp.where(all_mask, codes, jnp.uint32(0xFFFFFFFF)))
    pos_sorted = all_pts[order]
    isg_sorted = is_g[order]
    idx_sorted = order

    window = 32
    offs = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])
    m = n + p
    cand = jnp.clip(jnp.arange(m)[:, None] + offs[None, :], 0, m - 1)
    cd = jnp.sum((pos_sorted[cand] - pos_sorted[:, None, :]) ** 2, -1)
    cd = jnp.where(isg_sorted[cand], cd, jnp.inf)
    best = jnp.argmin(cd, axis=1)
    best_idx = jnp.take_along_axis(cand, best[:, None], 1)[:, 0]
    nearest_sorted = idx_sorted[best_idx]  # index into all_pts
    # fall back to gaussian 0 when no candidate
    nearest_sorted = jnp.where(
        jnp.isfinite(jnp.min(cd, axis=1)), nearest_sorted, 0
    )
    out = jnp.zeros((m,), jnp.int32).at[order].set(
        nearest_sorted.astype(jnp.int32)
    )
    q = out[n:]
    return jnp.clip(q, 0, n - 1), None
