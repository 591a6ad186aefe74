"""Mean squared 3-NN distance — TPU equivalent of ``simple-knn``'s
``distCUDA2`` (simple_knn.cu:185-219), used to initialize Gaussian scales
(gaussian_model.py:144-145).

Same algorithmic skeleton as the CUDA kernel — Morton-order locality +
windowed candidate search — but expressed as sort + static-window gather
instead of 1024-point boxes with min/max rejection:
  1. quantize to a 2^10 grid, interleave to 30-bit Morton codes
     (coord2Morton, simple_knn.cu:45-70),
  2. sort points by code,
  3. each point's KNN candidates = the ±W neighbors in Morton order,
  4. exact top-3 among candidates (updateKBest<3>, :147-183).
Like the reference this is approximate (locality can miss true
neighbors); W=32 gives parity well within the tolerance that scale
initialization needs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _expand_bits(v: jax.Array) -> jax.Array:
    """Spread 10 bits to every 3rd position (Morton interleave)."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(xyz: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """(N, 3) points -> (N,) uint32 Morton codes on the active bbox."""
    if mask is None:
        mask = jnp.ones(xyz.shape[:1], bool)
    big = jnp.float32(1e30)
    lo = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
    hi = jnp.max(jnp.where(mask[:, None], xyz, -big), axis=0)
    extent = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip(((xyz - lo) / extent) * 1023.0, 0.0, 1023.0).astype(
        jnp.uint32
    )
    return (
        (_expand_bits(q[:, 0]) << 2)
        | (_expand_bits(q[:, 1]) << 1)
        | _expand_bits(q[:, 2])
    )


@functools.partial(jax.jit, static_argnames=("k", "window"))
def knn_indices(
    xyz: jax.Array,
    mask: jax.Array | None = None,
    k: int = 16,
    window: int = 48,
) -> tuple[jax.Array, jax.Array]:
    """(N, k) approximate nearest-neighbor indices + squared distances.

    Morton-window candidates like ``mean_knn_dist2``; used for SuGaR's
    16-NN neighbor lists (sugar_model.py reset_neighbors:884).
    Inactive points get self-indices and +inf distances.
    """
    n = xyz.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    codes = morton_codes(xyz, mask)
    codes = jnp.where(mask, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes)
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    pts = xyz[order]
    act = mask[order]

    # includes offset 0: the point itself is its own nearest neighbor
    # (SuGaR's knn_points semantics)
    offs = jnp.arange(-window, window + 1)
    idx = jnp.arange(n)[:, None] + offs[None, :]
    in_range = (idx >= 0) & (idx < n)
    idx_c = jnp.clip(idx, 0, n - 1)
    cand = pts[idx_c]
    cand_ok = in_range & act[idx_c] & act[:, None]
    d2 = jnp.sum((cand - pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand_ok, d2, jnp.float32(jnp.inf))
    neg_top, top_pos = jax.lax.top_k(-d2, k)  # (N, k) positions in window
    top_d2 = -neg_top
    nbr_sorted = jnp.take_along_axis(idx_c, top_pos, axis=1)  # morton space
    nbr_orig = order[nbr_sorted]  # original ids
    self_orig = order[jnp.arange(n)]
    nbr_orig = jnp.where(
        jnp.isfinite(top_d2), nbr_orig, self_orig[:, None]
    )
    # scatter back to original order
    out_idx = jnp.zeros((n, k), jnp.int32).at[order].set(
        nbr_orig.astype(jnp.int32)
    )
    out_d2 = jnp.full((n, k), jnp.inf, jnp.float32).at[order].set(top_d2)
    del inv
    return out_idx, out_d2


@functools.partial(jax.jit, static_argnames=("k", "window"))
def mean_knn_dist2(
    xyz: jax.Array,
    mask: jax.Array | None = None,
    k: int = 3,
    window: int = 32,
) -> jax.Array:
    """(N,) mean squared distance to the k nearest neighbors (distCUDA2).

    Inactive points (mask False) neither query nor serve as neighbors;
    their output is 0.
    """
    n = xyz.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    codes = morton_codes(xyz, mask)
    # inactive points sort to the end
    codes = jnp.where(mask, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes)
    pts = xyz[order]
    act = mask[order]

    # candidate window: offsets -W..-1, 1..W in sorted order
    offs = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )  # (2W,)
    idx = jnp.arange(n)[:, None] + offs[None, :]  # (N, 2W)
    in_range = (idx >= 0) & (idx < n)
    idx_c = jnp.clip(idx, 0, n - 1)
    cand = pts[idx_c]  # (N, 2W, 3)
    cand_ok = in_range & act[idx_c] & act[:, None]
    d2 = jnp.sum((cand - pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand_ok, d2, jnp.float32(jnp.inf))
    # top-k smallest
    neg_top, _ = jax.lax.top_k(-d2, k)
    top = -neg_top  # (N, k)
    valid = jnp.isfinite(top)
    mean = jnp.sum(jnp.where(valid, top, 0.0), axis=-1) / jnp.maximum(
        jnp.sum(valid, axis=-1), 1
    )
    mean = jnp.where(act, mean, 0.0)

    # scatter back to original order
    out = jnp.zeros((n,), jnp.float32).at[order].set(mean)
    return out
