"""Tile binning v2: linear-pass duplicate expansion + one stable sort.

Parity target: ``cuda_rasterizer/rasterizer_impl.cu:197-339`` — the
InclusiveSum / duplicateWithKeys / radix-SortPairs / identifyTileRanges
pipeline (same (tile, depth)-sorted chunk-aligned output contract as v1).

TPU-first v2 (v1 profiled at 2.8 s/frame at Garden scale; XLA's
``searchsorted`` costs 1.2 s per call and every 8M-element gather ~80 ms):

1. Gaussians are pre-sorted by view depth (argsort over N, cheap), so a
   single *stable one-key sort by tile id* yields (tile, depth) order —
   no 64-bit keys, no second sort key.
2. The slot→gaussian map (searchsorted(offsets, iota)) becomes
   telescoping-delta scatters + cumsum (``segment_fill_int``) — exact
   same semantics, ~30x cheaper than searchsorted and gather-free.
3. The slot rank within its gaussian comes from a ``cummax`` over group
   start positions — no offsets gather.
4. Per-gaussian tile rects expand through the same fill (packed int32,
   9/9/9-bit tmin_x/tmin_y/rect_w — supports ≤8K-pixel images).
5. Chunk alignment is built *into the sort*: per-tile pad entries
   (counted exactly via a rect-corner 2D summed-area table) are appended
   after the real duplicates and sort stably into each tile's tail, so
   no post-sort re-gather pass exists at all.

Output: ``gid`` indexes gaussians in their ORIGINAL order (the
depth-rank→original-id map is expanded by the same fill trick, so
feature packing never reorders); pad/sentinel slots point at the dummy
index N (callers append an inert column).

All per-gaussian→per-duplicate expansions are gather-free: XLA gathers
run ~1 element/cycle, but group ids are monotone over slots, so each
expansion is an exact scatter of telescoping int32 deltas at group
starts followed by a cumsum (``segment_fill_int``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from autovfx_tpu.ops.projection import Splats2D, TILE

CHUNK = 256  # duplicates processed per kernel step (MXU-friendly)


class BinnedSplats(NamedTuple):
    """Depth-sorted, tile-bucketed, chunk-aligned splat duplicates."""

    gid: jax.Array  # (K,) int32 into depth-ordered gaussians; N = inert
    tile: jax.Array  # (K,) int32 tile id (== num_tiles for sentinel slots)
    valid: jax.Array  # (K,) bool — live duplicate
    depth_order: jax.Array  # (N,) original index of depth-rank i
    tile_start: jax.Array  # (T,) int32 aligned start (multiple of CHUNK)
    tile_count: jax.Array  # (T,) int32 live duplicates in each tile
    tile_chunks: jax.Array  # (T,) int32 number of CHUNK-steps per tile
    num_tiles_x: int
    num_tiles_y: int
    total_dups: jax.Array  # () int32 live duplicates requested (pre-clip)
    overflow: jax.Array  # () bool — budget exceeded, render truncated


def num_tiles(width: int, height: int, tile: int = TILE) -> tuple[int, int]:
    return (width + tile - 1) // tile, (height + tile - 1) // tile


def _pack_rect(tmin_x, tmin_y, rect_w):
    return tmin_x | (tmin_y << 9) | (rect_w << 18)


def _unpack_rect(packed):
    return packed & 0x1FF, (packed >> 9) & 0x1FF, (packed >> 18) & 0x1FF


def segment_fill_int(values: jax.Array, starts: jax.Array, k: int):
    """Expand per-group int32 ``values`` to slots: out[i] = values[g(i)]
    where group g starts at ``starts[g]`` (non-decreasing).

    XLA gathers run ~1 element/cycle (scalar-bound); this is the fast
    replacement: scatter telescoping deltas at the group starts and
    integer-cumsum.  Groups sharing a start slot (zero-length groups)
    telescope correctly through the scatter-add.  Slots before the first
    start read 0; slots after the last group hold its value.
    """
    prev = jnp.concatenate([values[:1] * 0, values[:-1]])
    delta = values - prev
    buf = jnp.zeros((k,), jnp.int32).at[jnp.minimum(starts, k)].add(
        delta, mode="drop"
    )
    return jnp.cumsum(buf)


def bin_splats(
    splats: Splats2D,
    width: int,
    height: int,
    dup_budget: int,
    tile: int = TILE,
    chunk: int = CHUNK,
    fill_backend: str = "auto",
    pad_mode: str = "chunk",
) -> BinnedSplats:
    """``pad_mode``:

    - ``"chunk"`` (default, training/VJP contract): per-tile pad entries
      make every tile segment start at a multiple of ``chunk`` (the
      layout the backward kernel assumes).
    - ``"none"`` (inference fast path): no pad entries at all — only
      live duplicates go through the final sort, and the per-tile
      segments are derived *post-sort* with one tiny searchsorted
      (T+1 queries) instead of the per-tile count matmul + pad fills.
      ``tile_start`` is then the EXACT (unaligned) segment start and the
      blend kernel masks the partial leading/trailing chunks; the
      budget shrinks by the ~T·chunk/2 pad slots, which every K-sized
      stage (fill, sort, gather) pays for.
    """
    CHUNK = chunk  # noqa: N806 — local chunk size
    if chunk % 128:
        raise ValueError(
            "chunk must be a multiple of 128 (Mosaic DMA lane alignment)"
        )
    tiles_x, tiles_y = num_tiles(width, height, tile)
    n_tiles = tiles_x * tiles_y
    n = splats.depth.shape[0]
    if dup_budget % CHUNK:
        raise ValueError(f"dup_budget must be a multiple of {CHUNK}")
    if max(dup_budget, n) >= 1 << 24:
        # monotone_fill packs stream values into 3 bf16 8-bit digits
        # (fill_pallas.NUM_DIGITS); larger values silently corrupt the
        # group-start fill
        raise ValueError(
            "dup_budget and splat count must be < 2**24 "
            f"(got dup_budget={dup_budget}, n={n})"
        )
    k = dup_budget
    slot = jnp.arange(k, dtype=jnp.int32)

    # ---- depth pre-sort of gaussians ----------------------------------------
    # values ride the sort as payloads: XLA's post-hoc gathers run at
    # ~1 element / 14 ns (4 gathers cost more than the sort itself).
    # Sort cost ~0.7 ms/stream at N=1M: small tile grids (the production
    # operating point) pack the whole rect into ONE 29-bit stream
    # (x9|y9|w6|h5), cutting the presort from 5 to 3 streams.
    live = splats.tiles_touched > 0
    depth_key = jnp.where(live, splats.depth, jnp.float32(jnp.inf))
    import os

    compact = (
        tiles_x < 64
        and tiles_y < 32
        and os.environ.get("AUTOVFX_COMPACT_PRESORT", "1") != "0"
    )
    # (measured and rejected on-chip, r4: a single-stream final sort
    # packing [tile|depth-rank] into one uint32 key needs a (K,) gather
    # through depth_order to recover gid afterwards — XLA gathers are
    # index-rate-bound at ~14 ns/index, so the recovery costs ~3x what
    # the dropped sort stream saves: 44.3 -> 17.5 FPS at Garden scale.)
    if compact:
        rect_w0 = jnp.maximum(
            splats.tile_max[:, 0] - splats.tile_min[:, 0], 1
        )
        rect_h0 = jnp.maximum(
            splats.tile_max[:, 1] - splats.tile_min[:, 1], 1
        )
        packed_all = jnp.where(
            live,
            splats.tile_min[:, 0]
            | (splats.tile_min[:, 1] << 9)
            | (rect_w0 << 18)
            | (rect_h0 << 24),
            0,  # culled: w=h=0 -> counts 0 (no gather needed post-sort)
        )
        _, packed_d, depth_order = jax.lax.sort(
            (depth_key, packed_all, jnp.arange(n, dtype=jnp.int32)),
            num_keys=1,
        )
        xy_d = packed_d & 0x3FFFF
        w_d = (packed_d >> 18) & 0x3F
        counts_d = w_d * ((packed_d >> 24) & 0x1F)
    else:
        xy_packed = splats.tile_min[:, 0] | (splats.tile_min[:, 1] << 9)
        rect_w0 = jnp.maximum(
            splats.tile_max[:, 0] - splats.tile_min[:, 0], 1
        )
        _, counts_d, xy_d, w_d, depth_order = jax.lax.sort(
            (
                depth_key,
                splats.tiles_touched,
                xy_packed,
                rect_w0,
                jnp.arange(n, dtype=jnp.int32),
            ),
            num_keys=1,
        )

    offsets = jnp.cumsum(counts_d) - counts_d  # exclusive, depth order
    total = (offsets[-1] + counts_d[-1]).astype(jnp.int32)
    valid = slot < jnp.minimum(total, k)

    # depth presort puts culled gaussians (depth=inf) last, so live
    # gaussians form a prefix and their offsets chain contiguously.
    from autovfx_tpu.ops import fill_pallas as FP

    if fill_backend == "auto":
        fill_backend = (
            "pallas"
            if jax.default_backend() == "tpu" and k % FP.C_STEP == 0
            else "xla"
        )
    if fill_backend in ("pallas", "pallas_interpret"):
        # live offsets are strictly increasing (counts >= 1); the culled
        # suffix is excluded via the sentinel so windows stay bounded
        starts_eff = jnp.where(counts_d > 0, offsets, FP.EXCLUDED)
        if compact:
            # rect fits one 24-bit fill stream (x9|y9|w6): 3 streams
            xyw = xy_d | (w_d << 18)
            group_start, orig_id, xyw_f = FP.monotone_fill(
                starts_eff,
                [jnp.minimum(offsets, k), depth_order, xyw],
                k,
                interpret=(fill_backend == "pallas_interpret"),
            )
            xy_f = xyw_f & 0x3FFFF
            rect_w = xyw_f >> 18
        else:
            group_start, orig_id, xy_f, rect_w = FP.monotone_fill(
                starts_eff,
                [jnp.minimum(offsets, k), depth_order, xy_d, w_d],
                k,
                interpret=(fill_backend == "pallas_interpret"),
            )
        rank = slot - group_start
        tmin_x = xy_f & 0x1FF
        tmin_y = xy_f >> 9
        rect_w = jnp.maximum(rect_w, 1)
    else:
        # NOTE: separate (K,) scatters/cumsums beat a fused (K,3) row
        # form — narrow trailing dims pad to 128 lanes and multiply the
        # traffic.
        hist = jnp.zeros((k,), jnp.int32).at[
            jnp.minimum(jnp.where(counts_d > 0, offsets, k), k)
        ].add(1, mode="drop")
        group_start = jax.lax.cummax(jnp.where(hist > 0, slot, 0))
        rank = slot - group_start

        # per-duplicate gaussian data via gather-free segment fills
        rect_d = _pack_rect(xy_d & 0x1FF, xy_d >> 9, w_d)
        orig_id = segment_fill_int(depth_order, offsets, k)
        rpack = segment_fill_int(rect_d, offsets, k)
        tmin_x, tmin_y, rect_w = _unpack_rect(rpack)
        rect_w = jnp.maximum(rect_w, 1)

    # ---- tile of each duplicate ----------------------------------------------
    dy = rank // rect_w
    dx = rank - dy * rect_w
    tile_real = (tmin_y + dy) * tiles_x + (tmin_x + dx)

    # ---- exact per-tile counts: separable interval-indicator matmul ----------
    # count[ty, tx] = Σ_g [y0≤ty<y1][x0≤tx<x1] = Ayᵀ @ Ax — one MXU
    # matmul with the long (N) contraction; XLA scatters run ~7 ns/elem
    # so the rect-corner summed-area alternative costs 28 ms at N=1M.
    # (An in-register Pallas version — ops/tilecount_pallas.py —
    # measured 43.9 vs 44.3 FPS at Garden scale in r4: XLA already
    # overlaps this matmul with the rest of the pipeline, so the
    # kernel's rows-stacking overhead loses.  Kept XLA-only.  A
    # searchsorted over the SORTED stream computes the same bounds but
    # sits on the serialized sort→scalar-prefetch critical path:
    # 44.2 -> 40.2 FPS measured on-chip in r5.)
    txi = jnp.arange(tiles_x, dtype=jnp.int32)[None, :]
    tyi = jnp.arange(tiles_y, dtype=jnp.int32)[None, :]
    ax = (
        (splats.tile_min[:, 0:1] <= txi)
        & (txi < splats.tile_max[:, 0:1])
        & live[:, None]
    ).astype(jnp.float32)
    ay = (
        (splats.tile_min[:, 1:2] <= tyi) & (tyi < splats.tile_max[:, 1:2])
    ).astype(jnp.float32)
    tile_count = (
        jax.lax.dot_general(
            ay,
            ax,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        .round()
        .astype(jnp.int32)
        .reshape(-1)
    )

    if pad_mode == "none":
        # ---- compact segments: no pad entries anywhere ----------------
        # Sort live dups only; segment bounds come from the N-side
        # counts matmul above (exclusive cumsum), NOT from the sorted
        # stream, so they overlap with presort/fill/sort instead of
        # serializing before the blend's scalar prefetch.  tile_start
        # is EXACT (unaligned); the blend kernel floor-aligns its chunk
        # DMAs and masks the segment edges.  On overflow (total > k)
        # the stream is truncated and segments are inconsistent —
        # finite garbage, flagged, same contract as the padded path.
        tile_id = jnp.where(valid, tile_real, n_tiles)
        gid = jnp.where(valid, orig_id, n)
        tile_s, gid_s = jax.lax.sort((tile_id, gid), num_keys=1)
        start = jnp.minimum(
            jnp.cumsum(tile_count) - tile_count, k
        ).astype(jnp.int32)
        count_c = jnp.minimum(tile_count, k - start)
        base = (start // CHUNK) * CHUNK
        tile_chunks = jnp.where(
            count_c > 0, (start + count_c - base + CHUNK - 1) // CHUNK, 0
        )
        return BinnedSplats(
            gid=gid_s,
            tile=tile_s,
            valid=gid_s < n,
            depth_order=depth_order,
            tile_start=start,  # EXACT (unaligned) — kernel masks edges
            tile_count=count_c,
            tile_chunks=tile_chunks,
            num_tiles_x=tiles_x,
            num_tiles_y=tiles_y,
            total_dups=total,
            overflow=total > k,
        )

    tile_chunks_full = (tile_count + CHUNK - 1) // CHUNK
    aligned_len = tile_chunks_full * CHUNK
    pad_count = aligned_len - tile_count
    total_pad = jnp.sum(pad_count)
    padded_total = total + total_pad
    overflow = padded_total > k

    # ---- pad entries: slots [total, total+total_pad), tile-major order -------
    pad_offsets = total + jnp.cumsum(pad_count) - pad_count  # (T,)
    t_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    pad_tile = segment_fill_int(t_ids, pad_offsets, k)
    is_pad = (slot >= total) & (slot < jnp.minimum(padded_total, k))

    tile = jnp.where(valid, tile_real, jnp.where(is_pad, pad_tile, n_tiles))
    gid = jnp.where(valid, orig_id, n)  # pads/sentinels -> dummy column N

    # ---- the one stable sort (tile groups; depth order preserved) ------------
    tile_s, gid_s = jax.lax.sort((tile, gid), num_keys=1)

    # on overflow the raw cumulative starts exceed the budget; clamp so
    # downstream segment bases index real (truncated) rows — unclamped,
    # blend_ref's exclusive-scan base lands on an unrelated row and
    # w = 0·exp(+big) turns into NaN
    aligned_start = jnp.minimum(
        (jnp.cumsum(aligned_len) - aligned_len), k
    ).astype(jnp.int32)
    max_chunks = jnp.maximum((k - jnp.minimum(aligned_start, k)) // CHUNK, 0)
    tile_chunks = jnp.minimum(tile_chunks_full, max_chunks)
    tile_count = jnp.minimum(tile_count, tile_chunks * CHUNK)

    return BinnedSplats(
        gid=gid_s,
        tile=tile_s,
        valid=gid_s < n,
        depth_order=depth_order,
        tile_start=aligned_start,
        tile_count=tile_count,
        tile_chunks=tile_chunks,
        num_tiles_x=tiles_x,
        num_tiles_y=tiles_y,
        total_dups=total,
        overflow=overflow,
    )


def required_budget(
    splats: Splats2D, width: int, height: int,
    tile: int = TILE, chunk: int = CHUNK, pad_mode: str = "chunk",
) -> jax.Array:
    """Padded duplicate count for this view (host-side budget sizing).
    pad_mode="none" (compact segments) carries no per-tile pad slots."""
    tiles_x, tiles_y = num_tiles(width, height, tile)
    pad = 0 if pad_mode == "none" else tiles_x * tiles_y * chunk
    return jnp.sum(splats.tiles_touched) + pad


def round_budget(n: int, multiple: int | None = None, slack: float = 1.25) -> int:
    """Host helper: pad a measured duplicate count to a reusable budget.

    The default multiple keeps the budget divisible by the Pallas fill
    step (``fill_pallas.C_STEP``) so binning stays on the fast path."""
    import math

    if multiple is None:
        from autovfx_tpu.ops import fill_pallas as FP

        multiple = max(4 * CHUNK, FP.C_STEP)
    return int(math.ceil(n * slack / multiple) * multiple)
