"""Functional densification (clone / split / prune) in fixed capacity.

Parity target: ``scene/gaussian_model.py:280-413`` — densify_and_clone
(:335-347: grad ≥ τ and max-scale ≤ percent_dense·extent → copy),
densify_and_split (:306-333: grad ≥ τ and larger → 2 children sampled
from the Gaussian, scales /(0.8·2), parent pruned), prune (opacity <
min_opacity, screen radius > size_threshold, world scale > 0.1·extent),
reset_opacity (:268-273: min(op, 0.01)), and the grad-norm/denominator
accumulation of add_densification_stats (:415-417).

TPU-first: CUDA-side densification reallocates tensors every call; XLA
needs static shapes, so the splat store has fixed *capacity* and an
``active`` mask (core/gaussians.py).  New Gaussians are written into
free slots through a rank-matching gather (candidate i ↔ i-th free
slot), entirely inside jit; capacity growth happens on host between
steps (``Gaussians.pad_to``).  Candidates that don't fit are dropped
and counted in ``dropped``.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.struct
import jax
import jax.numpy as jnp

from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.core.quaternion import quat_to_rotmat


@flax.struct.dataclass
class DensifyStats:
    grad_accum: jax.Array  # (N,) Σ ||d mean2d|| over iters where visible
    denom: jax.Array  # (N,) visibility counts
    max_radii: jax.Array  # (N,) int32 max screen radius seen

    @classmethod
    def zero(cls, capacity: int) -> "DensifyStats":
        return cls(
            grad_accum=jnp.zeros((capacity,), jnp.float32),
            denom=jnp.zeros((capacity,), jnp.float32),
            max_radii=jnp.zeros((capacity,), jnp.int32),
        )

    def update(
        self,
        mean2d_grad: jax.Array,
        radii: jax.Array,
        width: int,
        height: int,
    ):
        """Accumulate per-iteration stats (add_densification_stats).

        The reference accumulates the NDC-scaled screen gradient: the
        CUDA backward multiplies dL/dmean2D by 0.5*W / 0.5*H
        (backward.cu:488) before ``add_densification_stats``
        (gaussian_model.py:415-417), and the default grad_threshold
        2e-4 is calibrated to those units.  Our rasterizer produces
        pixel-space gradients, so scale here to reference units.
        """
        visible = radii > 0
        gnorm = scaled_grad_norm(mean2d_grad, width, height)
        return DensifyStats(
            grad_accum=self.grad_accum + jnp.where(visible, gnorm, 0.0),
            denom=self.denom + visible.astype(jnp.float32),
            max_radii=jnp.maximum(self.max_radii, radii),
        )


def scaled_grad_norm(
    mean2d_grad: jax.Array, width: int, height: int
) -> jax.Array:
    """||dL/dmean2D * [0.5*W, 0.5*H]|| — reference (NDC) gradient units."""
    scale = jnp.array([0.5 * width, 0.5 * height], jnp.float32)
    return jnp.linalg.norm(mean2d_grad * scale, axis=-1)


class DensifyResult(NamedTuple):
    gaussians: Gaussians
    stats: DensifyStats
    new_mask: jax.Array  # (N,) slots (re)written — zero their Adam moments
    n_cloned: jax.Array
    n_split: jax.Array
    n_pruned: jax.Array
    dropped: jax.Array  # candidates that didn't fit in capacity


def _take(g: Gaussians, idx: jax.Array) -> dict:
    return {
        "xyz": g.xyz[idx],
        "sh_dc": g.sh_dc[idx],
        "sh_rest": g.sh_rest[idx],
        "log_scales": g.log_scales[idx],
        "quats": g.quats[idx],
        "opacity_logit": g.opacity_logit[idx],
    }


def densify_and_prune(
    g: Gaussians,
    stats: DensifyStats,
    key: jax.Array,
    grad_threshold: float = 0.0002,
    min_opacity: float = 0.005,
    extent: float = 5.0,
    percent_dense: float = 0.01,
    max_screen_size: int | None = None,
) -> DensifyResult:
    n = g.capacity
    grads = stats.grad_accum / jnp.maximum(stats.denom, 1.0)
    max_scale = jnp.max(g.scales, axis=-1)

    high_grad = (grads >= grad_threshold) & g.active
    small = max_scale <= percent_dense * extent
    clone_mask = high_grad & small
    split_mask = high_grad & ~small

    # prune (gaussian_model.py:399-407)
    prune = g.active & (g.opacity < min_opacity)
    if max_screen_size is not None:
        prune = prune | (g.active & (stats.max_radii > max_screen_size))
        prune = prune | (g.active & (max_scale > 0.1 * extent))
    prune = prune | split_mask  # split parents are replaced by children

    active_after = g.active & ~prune

    # ---- candidate enumeration --------------------------------------------
    # candidates: clones first, then 2 children per split
    clone_rank = jnp.cumsum(clone_mask) - clone_mask  # exclusive
    n_clone = jnp.sum(clone_mask)
    split_rank = jnp.cumsum(split_mask) - split_mask
    n_split = jnp.sum(split_mask)
    n_cand = n_clone + 2 * n_split

    # map candidate id -> (parent, is_split_child, child_slot)
    cand_parent = jnp.zeros((n,), jnp.int32)
    cand_kind = jnp.zeros((n,), jnp.int32)  # 0 clone, 1 child
    parents = jnp.arange(n, dtype=jnp.int32)

    def scatter(buf, idx, val, mask):
        idx = jnp.where(mask & (idx < n), idx, n)  # out-of-range drops
        return buf.at[idx].set(val, mode="drop")

    cand_parent = scatter(cand_parent, clone_rank, parents, clone_mask)
    c0 = n_clone + 2 * split_rank
    cand_parent = scatter(cand_parent, c0, parents, split_mask)
    cand_parent = scatter(cand_parent, c0 + 1, parents, split_mask)
    cand_kind = scatter(cand_kind, c0, jnp.ones((n,), jnp.int32), split_mask)
    cand_kind = scatter(
        cand_kind, c0 + 1, jnp.ones((n,), jnp.int32), split_mask
    )

    # ---- rank-matching: i-th free slot takes candidate i --------------------
    free = ~active_after
    free_rank = jnp.cumsum(free) - free
    takes = free & (free_rank < n_cand)
    cand_id = jnp.where(takes, jnp.minimum(free_rank, n - 1), 0)
    parent = cand_parent[cand_id]
    is_child = cand_kind[cand_id] == 1

    src = _take(g, parent)
    # split children: sample from the parent Gaussian, shrink scales
    noise = jax.random.normal(key, (n, 3))
    rot = quat_to_rotmat(
        src["quats"]
        / jnp.maximum(
            jnp.linalg.norm(src["quats"], axis=-1, keepdims=True), 1e-12
        )
    )
    sample = jnp.einsum(
        "nij,nj->ni", rot, jnp.exp(src["log_scales"]) * noise
    )
    child_xyz = src["xyz"] + sample
    child_log_scales = src["log_scales"] - jnp.log(0.8 * 2.0)

    new_xyz = jnp.where(is_child[:, None], child_xyz, src["xyz"])
    new_log_scales = jnp.where(
        is_child[:, None], child_log_scales, src["log_scales"]
    )

    def put(cur, new, take_mask):
        shape_ones = (1,) * (cur.ndim - 1)
        m = take_mask.reshape((-1,) + shape_ones)
        return jnp.where(m, new, cur)

    g2 = Gaussians(
        xyz=put(g.xyz, new_xyz, takes),
        sh_dc=put(g.sh_dc, src["sh_dc"], takes),
        sh_rest=put(g.sh_rest, src["sh_rest"], takes),
        log_scales=put(g.log_scales, new_log_scales, takes),
        quats=put(g.quats, src["quats"], takes),
        opacity_logit=put(g.opacity_logit, src["opacity_logit"], takes),
        active=active_after | takes,
    )
    dropped = jnp.maximum(n_cand - jnp.sum(takes), 0)
    return DensifyResult(
        gaussians=g2,
        stats=DensifyStats.zero(n),
        new_mask=takes | prune,
        n_cloned=n_clone,
        n_split=n_split,
        n_pruned=jnp.sum(prune & g.active),
        dropped=dropped,
    )


def reset_opacity(g: Gaussians, ceiling: float = 0.01) -> Gaussians:
    """opacity <- min(opacity, 0.01) (gaussian_model.py:268-273)."""
    import numpy as np

    cap_logit = float(np.log(ceiling / (1 - ceiling)))
    return g.replace(
        opacity_logit=jnp.minimum(g.opacity_logit, cap_logit)
    )
