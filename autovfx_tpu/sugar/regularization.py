"""SuGaR coarse-training regularization losses.

Parity target: ``sugar/sugar_trainers/coarse_density.py`` —
entropy regularization on opacities (:593-606), 1M near-surface samples
per iteration (:166, :668-690), density-target loss
``|exp(-d²/2β²) − density|`` against the splatted-depth distance
estimate (:734-742), and the SDF-better-normal loss aligning analytic
field normals with neighbor gaussian normals (:753-779); coarse_sdf.py
is the same skeleton with sdf_estimation_mode='sdf'.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from autovfx_tpu.core.cameras import Camera
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.ops.knn import knn_indices
from autovfx_tpu.sugar import density as D


def opacity_entropy_loss(g: Gaussians) -> jax.Array:
    """-mean[o ln o + (1-o) ln(1-o)] pushing opacities to 0/1
    (coarse_density.py:593-606)."""
    o = jnp.clip(g.opacity, 1e-6, 1 - 1e-6)
    ent = -(o * jnp.log(o) + (1 - o) * jnp.log(1 - o))
    w = g.active.astype(jnp.float32)
    return jnp.sum(ent * w) / jnp.maximum(w.sum(), 1.0)


class SdfSamples(NamedTuple):
    points: jax.Array  # (S, 3)
    source: jax.Array  # (S,) gaussian index sampled from
    neighbors: jax.Array  # (S, k) gaussian neighbor lists


def sample_sdf_points(
    g: Gaussians,
    key: jax.Array,
    num_samples: int,
    visibility_mask: jax.Array | None = None,
    k: int = 16,
) -> SdfSamples:
    """Sample near-surface points in (visible) gaussians and attach
    neighbor lists (coarse_density.py:668-690)."""
    pts, src = D.sample_points_in_gaussians(
        g, key, num_samples, mask=visibility_mask
    )
    # neighbor list of a sample ≈ neighbor list of its source gaussian
    g_neighbors = D.reset_neighbors(g, k=k)
    return SdfSamples(points=pts, source=src, neighbors=g_neighbors[src])


def estimate_surface_distance(
    samples: jax.Array,  # (S, 3)
    cam: Camera,
    depth_map: jax.Array,  # (H, W) rendered alpha-weighted depth
    alpha_map: jax.Array,  # (H, W)
) -> tuple[jax.Array, jax.Array]:
    """|sample depth − splatted surface depth| along the camera ray
    (coarse_density.py:700-742's depth-based distance estimate).

    Returns (distance estimate (S,), valid mask (S,)).
    """
    uv, z = cam.project(samples)
    x = jnp.clip(uv[:, 0].astype(jnp.int32), 0, cam.width - 1)
    y = jnp.clip(uv[:, 1].astype(jnp.int32), 0, cam.height - 1)
    a = alpha_map[y, x]
    surf = depth_map[y, x] / jnp.maximum(a, 1e-6)
    valid = (
        (z > 0)
        & (uv[:, 0] >= 0)
        & (uv[:, 0] < cam.width)
        & (uv[:, 1] >= 0)
        & (uv[:, 1] < cam.height)
        & (a > 0.5)
    )
    return jnp.abs(z - surf), valid


def density_regularization_loss(
    g: Gaussians,
    samples: SdfSamples,
    cam: Camera,
    depth_map: jax.Array,
    alpha_map: jax.Array,
) -> jax.Array:
    """|target − density| with target = exp(-d²/(2β²))
    (coarse_density.py:734-742)."""
    dist, valid = estimate_surface_distance(
        samples.points, cam, depth_map, alpha_map
    )
    beta = jnp.maximum(D.compute_beta(samples.points, samples.neighbors, g),
                       1e-6)
    target = jnp.exp(-(dist**2) / (2.0 * beta**2))
    dens = D.compute_density(samples.points, samples.neighbors, g)
    dens = jnp.clip(dens, 0.0, 1.0)
    err = jnp.abs(target - dens)
    w = valid.astype(jnp.float32)
    return jnp.sum(err * w) / jnp.maximum(w.sum(), 1.0)


def sdf_regularization_loss(
    g: Gaussians,
    samples: SdfSamples,
    cam: Camera,
    depth_map: jax.Array,
    alpha_map: jax.Array,
) -> jax.Array:
    """|sdf_estimate − d| / β normalization (coarse_sdf.py mode)."""
    dist, valid = estimate_surface_distance(
        samples.points, cam, depth_map, alpha_map
    )
    beta = jnp.maximum(D.compute_beta(samples.points, samples.neighbors, g),
                       1e-6)
    dens = D.compute_density(samples.points, samples.neighbors, g)
    sdf_est = D.density_to_sdf(dens, beta)
    err = jnp.abs(sdf_est - dist) / beta
    w = valid.astype(jnp.float32)
    return jnp.sum(err * w) / jnp.maximum(w.sum(), 1.0)


def normal_consistency_loss(
    g: Gaussians, samples: SdfSamples
) -> jax.Array:
    """Align analytic field normals at samples with their source
    gaussian's min-axis normal (coarse_density.py:753-779)."""
    grad = D.density_gradient(samples.points, samples.neighbors, g)
    n_field = grad / jnp.maximum(
        jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9
    )
    n_gauss = g.normals()[samples.source]
    cos = jnp.abs(jnp.sum(n_field * n_gauss, axis=-1))
    return jnp.mean(1.0 - cos)
