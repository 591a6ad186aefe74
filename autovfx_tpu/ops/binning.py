"""Tile binning: duplicate-by-tile, depth sort, chunk-aligned tile ranges.

Parity target: ``cuda_rasterizer/rasterizer_impl.cu:197-339`` — the
InclusiveSum (:278) / duplicateWithKeys (:290-299) / radix SortPairs
(:304-309) / identifyTileRanges (:313-319) pipeline.

TPU-first re-design: CUDA scatters duplicates with one thread per
Gaussian; XLA wants static shapes and gathers.  We invert the mapping:
a static duplicate budget ``K`` indexes *into* the Gaussian list via
``searchsorted`` on the exclusive-prefix-sum of per-Gaussian tile counts
("repeat via searchsorted"), then a stable two-key ``lax.sort`` on
(tile_id, depth) replaces the 64-bit radix sort.  Finally the sorted
list is re-gathered into a *chunk-aligned* layout: every tile's range
starts at a multiple of CHUNK and is padded with inert slots, so the
Pallas blend kernels can DMA fixed-size chunks that never straddle two
tiles (and the backward kernel's chunk writes never race).
Overflowing the budget truncates trailing tiles and sets ``overflow``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from autovfx_tpu.ops.projection import Splats2D, TILE

CHUNK = 256  # duplicates processed per kernel step (MXU-friendly)


class BinnedSplats(NamedTuple):
    """Depth-sorted, tile-bucketed, chunk-aligned splat duplicates."""

    gid: jax.Array  # (K,) int32 source Gaussian index per slot
    tile: jax.Array  # (K,) int32 tile id (== num_tiles for inert slots)
    valid: jax.Array  # (K,) bool — live duplicate
    tile_start: jax.Array  # (T,) int32 aligned start (multiple of CHUNK)
    tile_count: jax.Array  # (T,) int32 live duplicates in each tile
    tile_chunks: jax.Array  # (T,) int32 number of CHUNK-steps per tile
    num_tiles_x: int
    num_tiles_y: int
    total_dups: jax.Array  # () int32 live duplicates requested (pre-clip)
    overflow: jax.Array  # () bool — budget exceeded, render truncated


def num_tiles(width: int, height: int) -> tuple[int, int]:
    return (width + TILE - 1) // TILE, (height + TILE - 1) // TILE


def bin_splats(
    splats: Splats2D,
    width: int,
    height: int,
    dup_budget: int,
) -> BinnedSplats:
    """Build the sorted, chunk-aligned (tile, depth) duplicate list."""
    tiles_x, tiles_y = num_tiles(width, height)
    n_tiles = tiles_x * tiles_y
    counts = splats.tiles_touched  # (N,)
    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
    total = offsets[-1] + counts[-1]

    if dup_budget % CHUNK:
        raise ValueError(f"dup_budget must be a multiple of {CHUNK}")
    k = dup_budget
    slot = jnp.arange(k, dtype=jnp.int32)

    # --- phase 1: unaligned duplicate expansion -----------------------------
    gid = (
        jnp.searchsorted(offsets, slot, side="right").astype(jnp.int32) - 1
    )
    gid = jnp.clip(gid, 0, counts.shape[0] - 1)
    valid = slot < total

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
    # SortPairs on packed [tile|depth] 64-bit keys (ties keep Gaussian
    # index order, like cub's stable radix sort).
    tile_s, _, gid_s = jax.lax.sort((tile, depth, gid), num_keys=2)

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    raw_start = jnp.searchsorted(tile_s, tile_ids, side="left").astype(
        jnp.int32
    )
    raw_end = jnp.searchsorted(tile_s, tile_ids, side="right").astype(
        jnp.int32
    )
    tile_count = raw_end - raw_start

    # --- phase 2: chunk-aligned re-gather ------------------------------------
    tile_chunks = (tile_count + CHUNK - 1) // CHUNK
    aligned_len = tile_chunks * CHUNK
    aligned_start = (jnp.cumsum(aligned_len) - aligned_len).astype(jnp.int32)
    padded_total = aligned_start[-1] + aligned_len[-1] if n_tiles else 0

    a_tile = (
        jnp.searchsorted(aligned_start, slot, side="right").astype(jnp.int32)
        - 1
    )
    a_tile = jnp.clip(a_tile, 0, n_tiles - 1)
    a_rank = slot - aligned_start[a_tile]
    a_valid = (a_rank < tile_count[a_tile]) & (slot < padded_total)
    src = jnp.clip(
        raw_start[a_tile] + jnp.minimum(a_rank, tile_count[a_tile] - 1),
        0,
        k - 1,
    )
    gid_a = jnp.where(a_valid, gid_s[src], 0)
    tile_a = jnp.where(a_valid, a_tile, n_tiles)

    # Truncated tiles (budget overflow): clamp chunk counts to the budget.
    max_chunks = jnp.maximum(
        (k - aligned_start) // CHUNK, 0
    )
    tile_chunks = jnp.minimum(tile_chunks, max_chunks)
    tile_count = jnp.minimum(tile_count, tile_chunks * CHUNK)

    return BinnedSplats(
        gid=gid_a,
        tile=tile_a,
        valid=a_valid,
        tile_start=aligned_start,
        tile_count=tile_count,
        tile_chunks=tile_chunks,
        num_tiles_x=tiles_x,
        num_tiles_y=tiles_y,
        total_dups=total.astype(jnp.int32),
        overflow=padded_total > k,
    )


def required_budget(splats: Splats2D, width: int, height: int) -> jax.Array:
    """Padded duplicate count for this view (host-side budget sizing)."""
    tiles_x, tiles_y = num_tiles(width, height)
    # upper bound: every tile pads to a CHUNK boundary
    return jnp.sum(splats.tiles_touched) + tiles_x * tiles_y * CHUNK


def round_budget(n: int, multiple: int = 4 * CHUNK, slack: float = 1.25) -> int:
    """Host helper: pad a measured duplicate count to a reusable budget."""
    import math

    return int(math.ceil(n * slack / multiple) * multiple)
