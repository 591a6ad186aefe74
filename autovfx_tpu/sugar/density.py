"""SuGaR density / SDF field over the Gaussian mixture.

Parity target: ``sugar/sugar_scene/sugar_model.py`` —
``compute_density`` (:1216-1239: density(x) = Σ_{j∈16NN(x)} σ_j ·
exp(-½ (x-μ_j)ᵀ Σ_j⁻¹ (x-μ_j))), ``get_beta`` (:1043-1117, mode
'average': β(x) = mean min-scale of the 16 nearest Gaussians), and the
field values / SDF estimate used by the regularization
(``get_field_values``:1118).

TPU-first: neighbor lists come from the Morton-window KNN
(ops/knn.knn_indices) instead of PyTorch3D ``knn_points``; evaluation is
chunked fixed-shape gathers + VPU math under jit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.core.quaternion import quat_to_rotmat
from autovfx_tpu.ops.knn import knn_indices


def gaussian_inverse_covariance(g: Gaussians) -> jax.Array:
    """(N, 3, 3) inverse world covariance R S^-2 R^T."""
    rot = quat_to_rotmat(g.rotations)
    inv_s2 = 1.0 / jnp.maximum(g.scales**2, 1e-12)
    return jnp.einsum("nij,nj,nkj->nik", rot, inv_s2, rot)


def reset_neighbors(g: Gaussians, k: int = 16):
    """(N, k) neighbor indices among active gaussians (reset_neighbors)."""
    idx, _ = knn_indices(g.xyz, g.active, k=k)
    return idx


@functools.partial(jax.jit, static_argnames=("chunk",))
def compute_density(
    points: jax.Array,  # (P, 3) query points
    point_neighbors: jax.Array,  # (P, k) gaussian indices per point
    g: Gaussians,
    chunk: int = 1 << 18,
) -> jax.Array:
    """Density at query points from their k nearest gaussians."""
    inv_cov = gaussian_inverse_covariance(g)
    opacity = g.opacity

    def eval_chunk(pts, nbrs):
        mu = g.xyz[nbrs]  # (C, k, 3)
        ic = inv_cov[nbrs]  # (C, k, 3, 3)
        op = opacity[nbrs]  # (C, k)
        d = pts[:, None, :] - mu
        mahal = jnp.einsum("cki,ckij,ckj->ck", d, ic, d)
        return jnp.sum(op * jnp.exp(-0.5 * mahal), axis=-1)

    p = points.shape[0]
    pad = (-p) % chunk
    pts = jnp.concatenate([points, jnp.zeros((pad, 3))], 0)
    nbr = jnp.concatenate(
        [point_neighbors, jnp.zeros((pad, point_neighbors.shape[1]),
                                    jnp.int32)], 0
    )
    out = jax.lax.map(
        lambda args: eval_chunk(*args),
        (pts.reshape(-1, chunk, 3), nbr.reshape(-1, chunk,
                                                point_neighbors.shape[1])),
    )
    return out.reshape(-1)[:p]


def compute_beta(
    points: jax.Array,
    point_neighbors: jax.Array,
    g: Gaussians,
    mode: str = "average",
    log_beta: jax.Array | None = None,
    opacity_min_clamp: float = 1e-16,
) -> jax.Array:
    """β(x) per query point (get_beta, sugar_model.py:1043-1117).

    modes: 'average' = mean min-scale of the k nearest gaussians;
    'weighted_average' = opacity-weighted mean of neighbor min-scales;
    'learnable' = a single trained scalar exp(log_beta) for all points.
    """
    if mode == "learnable":
        if log_beta is None:
            raise ValueError("learnable beta mode needs log_beta")
        return jnp.broadcast_to(jnp.exp(log_beta), points.shape[:1])
    min_scale = jnp.min(g.scales, axis=-1)
    if mode == "weighted_average":
        op = g.opacity[point_neighbors]
        w = op / jnp.maximum(
            jnp.sum(op, axis=-1, keepdims=True), opacity_min_clamp
        )
        return jnp.maximum(
            jnp.sum(w * min_scale[point_neighbors], axis=-1), 1e-8
        )
    return jnp.mean(min_scale[point_neighbors], axis=-1)


def density_to_sdf(density: jax.Array, beta: jax.Array) -> jax.Array:
    """SDF estimate: s = β·sqrt(-2 ln(clamp(d))) (sugar_model.py
    get_field_values sdf mode)."""
    d = jnp.clip(density, 1e-12, 1.0 - 1e-7)
    return beta * jnp.sqrt(-2.0 * jnp.log(d))


def density_gradient(
    points: jax.Array, point_neighbors: jax.Array, g: Gaussians
) -> jax.Array:
    """Analytic ∇density (used for level-set normals,
    sugar_model.py:1888-1951)."""
    inv_cov = gaussian_inverse_covariance(g)
    mu = g.xyz[point_neighbors]
    ic = inv_cov[point_neighbors]
    op = g.opacity[point_neighbors]
    d = points[:, None, :] - mu
    icd = jnp.einsum("ckij,ckj->cki", ic, d)
    mahal = jnp.einsum("cki,cki->ck", d, icd)
    w = op * jnp.exp(-0.5 * mahal)
    return -jnp.sum(w[..., None] * icd, axis=1)


def sample_points_in_gaussians(
    g: Gaussians,
    key: jax.Array,
    num_samples: int,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Sample points from the Gaussian mixture (sample_points_in_gaussians,
    sugar_model.py:757): pick gaussians ∝ mask, sample x ~ N(μ, Σ).

    Returns (points (S, 3), source gaussian index (S,)).
    """
    k1, k2 = jax.random.split(key)
    w = g.active.astype(jnp.float32)
    if mask is not None:
        w = w * mask.astype(jnp.float32)
    idx = jax.random.categorical(
        k1, jnp.log(jnp.maximum(w, 1e-12)), shape=(num_samples,)
    )
    rot = quat_to_rotmat(g.rotations[idx])
    eps = jax.random.normal(k2, (num_samples, 3))
    offset = jnp.einsum("nij,nj->ni", rot, g.scales[idx] * eps)
    return g.xyz[idx] + offset, idx
