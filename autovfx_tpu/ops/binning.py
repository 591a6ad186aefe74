"""Tile binning: duplicate-by-tile, depth sort, per-tile ranges.

Parity target: ``cuda_rasterizer/rasterizer_impl.cu:197-339`` — the
InclusiveSum (:278) / duplicateWithKeys (:290-299) / radix SortPairs
(:304-309) / identifyTileRanges (:313-319) pipeline.

TPU-first re-design: CUDA scatters duplicates with one thread per
Gaussian; XLA wants static shapes and gathers.  We invert the mapping:
a static duplicate budget ``K`` indexes *into* the Gaussian list via
``searchsorted`` on the exclusive-prefix-sum of per-Gaussian tile counts
("repeat via searchsorted"), then a stable two-key ``lax.sort`` on
(tile_id, depth) replaces the 64-bit radix sort.  Overflowing the budget
drops the trailing duplicates and reports it via ``overflow``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from autovfx_tpu.ops.projection import Splats2D, TILE


class BinnedSplats(NamedTuple):
    """Depth-sorted, tile-bucketed splat duplicates (static budget K)."""

    gid: jax.Array  # (K,) int32 source Gaussian index per duplicate
    tile: jax.Array  # (K,) int32 tile id (== num_tiles for invalid slots)
    valid: jax.Array  # (K,) bool
    tile_start: jax.Array  # (T,) int32 first duplicate index of each tile
    tile_count: jax.Array  # (T,) int32 duplicates in each tile
    num_tiles_x: int
    num_tiles_y: int
    total_dups: jax.Array  # () int32 duplicates requested (pre-clip)
    overflow: jax.Array  # () bool — budget exceeded, render truncated


def num_tiles(width: int, height: int) -> tuple[int, int]:
    return (width + TILE - 1) // TILE, (height + TILE - 1) // TILE


def bin_splats(
    splats: Splats2D,
    width: int,
    height: int,
    dup_budget: int,
) -> BinnedSplats:
    """Build the sorted (tile, depth) duplicate list with a static budget."""
    tiles_x, tiles_y = num_tiles(width, height)
    n_tiles = tiles_x * tiles_y
    counts = splats.tiles_touched  # (N,)
    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
    total = offsets[-1] + counts[-1] if counts.shape[0] else jnp.int32(0)

    k = dup_budget
    slot = jnp.arange(k, dtype=jnp.int32)
    # Which Gaussian does duplicate slot i belong to?
    gid = (
        jnp.searchsorted(offsets, slot, side="right").astype(jnp.int32) - 1
    )
    gid = jnp.clip(gid, 0, counts.shape[0] - 1)
    valid = slot < total

    # Which tile within the Gaussian's rect?
    rank = slot - offsets[gid]
    rect_w = (splats.tile_max[gid, 0] - splats.tile_min[gid, 0]).astype(
        jnp.int32
    )
    safe_w = jnp.maximum(rect_w, 1)
    dy = rank // safe_w
    dx = rank - dy * safe_w
    tile = (splats.tile_min[gid, 1] + dy) * tiles_x + (
        splats.tile_min[gid, 0] + dx
    )
    tile = jnp.where(valid, tile, n_tiles)  # sentinel sorts to the end

    depth = jnp.where(valid, splats.depth[gid], jnp.float32(jnp.inf))

    # Stable lexicographic sort by (tile, depth) — replaces the radix
    # SortPairs on packed [tile|depth] 64-bit keys.
    tile_s, _, gid_s, valid_s = jax.lax.sort(
        (tile, depth, gid, valid.astype(jnp.int32)), num_keys=2
    )

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_s, tile_ids, side="left").astype(
        jnp.int32
    )
    tile_end = jnp.searchsorted(tile_s, tile_ids, side="right").astype(
        jnp.int32
    )

    return BinnedSplats(
        gid=gid_s,
        tile=tile_s,
        valid=valid_s.astype(bool),
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        num_tiles_x=tiles_x,
        num_tiles_y=tiles_y,
        total_dups=total.astype(jnp.int32),
        overflow=total > k,
    )


def required_budget(splats: Splats2D) -> jax.Array:
    """Exact duplicate count for this view (host-side budget sizing)."""
    return jnp.sum(splats.tiles_touched)


def round_budget(n: int, multiple: int = 4096, slack: float = 1.25) -> int:
    """Host helper: pad a measured duplicate count to a reusable budget."""
    import math

    return int(math.ceil(n * slack / multiple) * multiple)
