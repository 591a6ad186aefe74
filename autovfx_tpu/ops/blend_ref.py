"""Reference (pure-jnp) tile blend — differentiable via XLA autodiff.

Parity target: ``cuda_rasterizer/forward.cu`` renderCUDA (:261-378),
including the exact skip rules (power>0, alpha<1/255), the 0.99 alpha
clamp, the ``test_T < 1e-4`` done-freeze, and the output semantics
(color = C + T*bg, depth = alpha-weighted sum, alpha = 1-T).

TPU-first re-design: the CUDA per-pixel sequential loop becomes a
*segmented prefix-sum in log-transmittance space* over the depth-sorted
duplicate list: logT_k = Σ_{j<k, same tile} log(1-α_j).  The done-freeze
is exact because test_T is monotone within a segment, so the freeze mask
is simply ``test_T < 1e-4`` per duplicate (see blend notes below).  The
Pallas kernel (blend_pallas.py) computes the same quantities per tile
with the prefix-sums done as lower-triangular matmuls on the MXU.

Memory: O(K · 256) — intended for tests/small renders; production goes
through the Pallas kernel which keeps tiles in VMEM.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from autovfx_tpu.ops.binning import BinnedSplats
from autovfx_tpu.ops.projection import Splats2D, TILE

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
TILE_PIXELS = TILE * TILE


class TileImages(NamedTuple):
    color: jax.Array  # (T, 256, 3)
    depth: jax.Array  # (T, 256)
    alpha: jax.Array  # (T, 256)


def _pixel_offsets(tile: int = TILE):
    p = jnp.arange(tile * tile, dtype=jnp.float32)
    return p % tile, p // tile


def compute_alpha(mean2d, conic, opacity, px, py):
    """CUDA renderCUDA alpha semantics for (K,) splats × (K, P) pixels."""
    dx = mean2d[:, 0:1] - px
    dy = mean2d[:, 1:2] - py
    power = (
        -0.5 * (conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy)
        - conic[:, 1:2] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_MAX, opacity[:, None] * jnp.exp(power))
    valid = (power <= 0.0) & (alpha >= ALPHA_MIN)
    return jnp.where(valid, alpha, 0.0)


def blend_tiles_ref(
    binned: BinnedSplats,
    mean2d: jax.Array,  # (K, 2) gathered, sorted
    conic: jax.Array,  # (K, 3)
    color: jax.Array,  # (K, 3)
    opacity: jax.Array,  # (K,) — 0 for invalid slots
    depth: jax.Array,  # (K,)
    tile: int = TILE,
) -> TileImages:
    k = mean2d.shape[0]
    n_tiles = binned.tile_start.shape[0]
    tiles_x = binned.num_tiles_x

    # Per-duplicate pixel coordinates of its tile.
    ox = (binned.tile % tiles_x).astype(jnp.float32) * tile
    oy = (binned.tile // tiles_x).astype(jnp.float32) * tile
    px_off, py_off = _pixel_offsets(tile)
    px = ox[:, None] + px_off[None, :]  # (K, 256)
    py = oy[:, None] + py_off[None, :]

    alpha = compute_alpha(mean2d, conic, opacity, px, py)  # (K, 256)

    # Segment bases: cumulative values at each duplicate's tile start.
    seg_ids = jnp.clip(binned.tile, 0, n_tiles - 1)
    starts = binned.tile_start[seg_ids]  # (K,)

    def seg_exclusive(x):
        cum = jnp.cumsum(x, axis=0)
        exc = cum - x
        base = jnp.where(
            (starts > 0)[:, None], cum[jnp.maximum(starts - 1, 0)], 0.0
        )
        # transmittance never exceeds 1 (guards overflow-truncated
        # segment bases and f32 cumsum cancellation)
        return jnp.minimum(exc - base, 0.0)

    lg = jnp.log1p(-alpha)
    log_t = seg_exclusive(lg)  # logT before each duplicate (raw)
    test_t = jnp.exp(log_t) * (1.0 - alpha)
    frozen = test_t < T_EPS  # monotone within a segment

    alpha_hat = jnp.where(frozen, 0.0, alpha)
    lg_hat = jnp.log1p(-alpha_hat)
    log_t_hat = seg_exclusive(lg_hat)
    w = alpha_hat * jnp.exp(log_t_hat)  # (K, 256)

    seg = jnp.where(binned.valid, binned.tile, n_tiles)
    tile_color = jax.ops.segment_sum(
        w[:, :, None] * color[:, None, :], seg, num_segments=n_tiles + 1
    )[:n_tiles]
    tile_depth = jax.ops.segment_sum(
        w * depth[:, None], seg, num_segments=n_tiles + 1
    )[:n_tiles]
    total_lg = jax.ops.segment_sum(lg_hat, seg, num_segments=n_tiles + 1)[
        :n_tiles
    ]
    tile_alpha = 1.0 - jnp.exp(total_lg)
    return TileImages(color=tile_color, depth=tile_depth, alpha=tile_alpha)


def blend_tiles_ref_from_feat(
    binned: BinnedSplats, feat_dup, tile: int = TILE
) -> TileImages:
    """Adapter: consume the packed (16, K) duplicate feature rows
    (blend_pallas.pack_gaussian_features layout)."""
    mean2d = jnp.stack([feat_dup[0], feat_dup[1]], axis=-1)
    conic = jnp.stack([feat_dup[2], feat_dup[3], feat_dup[4]], axis=-1)
    opacity = jnp.exp(feat_dup[5])
    color = jnp.stack([feat_dup[6], feat_dup[7], feat_dup[8]], axis=-1)
    depth = feat_dup[9]
    return blend_tiles_ref(
        binned, mean2d, conic, color, opacity, depth, tile=tile
    )


def assemble_rows(
    out_rows: jax.Array, tiles_x: int, tiles_y: int, width: int,
    height: int, tile: int = TILE,
) -> jax.Array:
    """(T, R, tile²) kernel output -> (R, H, W) in one relayout."""
    r = out_rows.shape[1]
    img = out_rows.reshape(tiles_y, tiles_x, r, tile, tile)
    img = jnp.transpose(img, (2, 0, 3, 1, 4)).reshape(
        r, tiles_y * tile, tiles_x * tile
    )
    return img[:, :height, :width]


def assemble_image(
    tile_img: jax.Array, tiles_x: int, tiles_y: int, width: int,
    height: int, tile: int = TILE,
) -> jax.Array:
    """(T, tile², C?) tile buffers -> (H, W, C?) image (crop padding)."""
    c_shape = tile_img.shape[2:]
    img = tile_img.reshape((tiles_y, tiles_x, tile, tile) + c_shape)
    img = jnp.swapaxes(img, 1, 2).reshape(
        (tiles_y * tile, tiles_x * tile) + c_shape
    )
    return img[:height, :width]
