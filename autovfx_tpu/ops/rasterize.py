"""Public differentiable Gaussian-splat rasterizer.

Drop-in equivalent of the reference CUDA extension's autograd wrapper
(``diff_gaussian_rasterization/__init__.py:92-158``: returns color,
depth, alpha, radii) and of ``gaussian_renderer.render()``
(:83-218: RGBA + depth + normal + pseudo-normal dict).

Pipeline (all under one jit):
  preprocess (projection.py, autodiff) → bin_splats (binning.py, integer)
  → gather (autodiff: VJP is the segment-sum scatter that replaces the
  CUDA backward's atomicAdd) → blend (blend_ref.py on CPU / tests,
  blend_pallas.py on TPU).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp

from autovfx_tpu.core.cameras import Camera
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.ops import binning, blend_ref, projection


@flax.struct.dataclass
class RasterConfig:
    dup_budget: int = flax.struct.field(pytree_node=False, default=1 << 20)
    backend: str = flax.struct.field(pytree_node=False, default="auto")
    scaling_modifier: float = flax.struct.field(pytree_node=False, default=1.0)
    sh_degree: Optional[int] = flax.struct.field(pytree_node=False, default=None)
    # tile edge in pixels (16 matches CUDA; 32 cuts duplicate count ~2.5x
    # on Garden-like scenes) and kernel chunk size (duplicates per step)
    tile: int = flax.struct.field(pytree_node=False, default=16)
    chunk: int = flax.struct.field(pytree_node=False, default=256)
    # "f32" = exact CUDA-parity features (differentiable); "bf16" packs
    # color/depth rows as bf16 pairs (8-row gather, ~1.6x faster;
    # inference only); "bf16x" additionally packs conic/log-opacity
    # (6-row gather — leanest; conic alpha error < 0.5 %)
    feature_pack: str = flax.struct.field(pytree_node=False, default="f32")


class RenderOutput(NamedTuple):
    color: jax.Array  # (H, W, 3) — includes T*bg like the CUDA kernel
    depth: jax.Array  # (H, W) alpha-weighted view-space depth (unnormalized)
    alpha: jax.Array  # (H, W) 1 - final transmittance
    radii: jax.Array  # (N,) int32 screen radius; 0 = culled
    overflow: jax.Array  # () bool — duplicate budget exceeded


def _select_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() == "tpu" else "ref"


def _pad_mode() -> str:
    """Binning layout for the packed inference path: "chunk" (padded,
    default) or "none" (pad-free compact; AUTOVFX_PAD_MODE=none).

    Measured on-chip (r5, healthy-device A/B at the Garden operating
    point): padded 44.11 FPS vs compact 39.99 novel view — compact wins
    every isolated stage (binning -1.3 ms, gather -7%) but loses ~2.3 ms
    end-to-end (edge-mask chunks + the K+chunk concat copies + scheduler
    overlap the padded path gets for free), so padded stays the default
    and compact remains the measured alternative."""
    import os

    return os.environ.get("AUTOVFX_PAD_MODE", "chunk")


def rasterize(
    g: Gaussians,
    cam: Camera,
    bg: jax.Array | None = None,
    config: RasterConfig = RasterConfig(),
    override_color: jax.Array | None = None,
    mean2d_offset: jax.Array | None = None,
    packed_rows: jax.Array | None = None,
) -> RenderOutput:
    """Render Gaussians through one camera.

    ``mean2d_offset``: optional zeros (N, 2); differentiate w.r.t. it to get
    screen-space position gradients for densification (the reference's
    ``screenspace_points`` trick).

    ``packed_rows``: optional field-major scene layout from
    ``preprocess_pallas.pack_scene_rows(g)`` — routes preprocessing + \
feature packing through the fused Pallas kernel (inference fast path;
    requires the pallas backend with feature_pack="bf16").
    """
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)

    from autovfx_tpu.ops import blend_pallas

    backend = _select_backend(config.backend)
    packed = config.feature_pack in ("bf16", "bf16x") and backend == "pallas"

    use_fused = (
        packed_rows is not None
        and packed
        and override_color is None
        and mean2d_offset is None
        and config.sh_degree is None
    )
    if use_fused:
        from autovfx_tpu.ops import preprocess_pallas as PP

        ps = PP.preprocess_packed(
            packed_rows, g.capacity, cam, tile=config.tile,
            scaling_modifier=config.scaling_modifier,
            feat_rows=6 if config.feature_pack == "bf16x" else 8,
        )
        splats, feat_g = ps.splats, ps.feat
    else:
        splats = projection.preprocess(
            g,
            cam,
            scaling_modifier=config.scaling_modifier,
            override_color=override_color,
            sh_degree=config.sh_degree,
            mean2d_offset=mean2d_offset,
            tile=config.tile,
        )
        # per-gaussian rows (O(N), differentiable); VJP of the gather
        # below is the segment-sum that replaces CUDA atomicAdd
        if packed and config.feature_pack == "bf16x":
            feat_g = blend_pallas.pack_gaussian_features_6(splats)
        elif packed:
            feat_g = blend_pallas.pack_gaussian_features_8(splats)
        else:
            feat_g = blend_pallas.pack_gaussian_features(splats)

    compact = packed and _pad_mode() == "none"
    binned = binning.bin_splats(
        splats, cam.width, cam.height, config.dup_budget,
        tile=config.tile, chunk=config.chunk,
        pad_mode="none" if compact else "chunk",
    )
    # (16/8/6, K) dup gather; a (K, R) row-major gather variant was
    # tried in r3 and is unbuildable: Mosaic requires lane-dim slices
    # aligned to the 128-lane tiling, so the (K, 8) layout pads 16x
    gid = binned.gid
    if compact:
        # compact segments: the kernel's floor-aligned final DMA can
        # read up to chunk-1 slots past the last segment — append one
        # inert dummy chunk (dummy column = last feat column)
        gid = jnp.concatenate(
            [gid, jnp.full((config.chunk,), feat_g.shape[1] - 1,
                           jnp.int32)]
        )
    feat_dup = feat_g[:, gid]

    tx, ty = binned.num_tiles_x, binned.num_tiles_y
    if backend == "pallas":
        n_tiles = tx * ty
        if packed:  # fast inference path (no VJP on the 8-row layout)
            out_rows = blend_pallas._blend_fwd_call(
                feat_dup, binned.tile_start, binned.tile_chunks,
                n_tiles, tx, config.tile, config.chunk,
                tile_count=binned.tile_count if compact else None,
            )
        else:
            out_rows = blend_pallas._blend_core(
                feat_dup, binned.tile_start, binned.tile_chunks,
                n_tiles, tx, config.tile, config.chunk,
            )  # (T, 8, tile²)
        rows = blend_ref.assemble_rows(
            out_rows, tx, ty, cam.width, cam.height, tile=config.tile
        )  # (8, H, W) in one relayout
        img_color = jnp.moveaxis(rows[0:3], 0, -1)
        img_depth = rows[3]
        img_alpha = rows[4]
    else:
        tiles = blend_ref.blend_tiles_ref_from_feat(
            binned, feat_dup, tile=config.tile
        )
        img_color = blend_ref.assemble_image(
            tiles.color, tx, ty, cam.width, cam.height, tile=config.tile
        )
        img_depth = blend_ref.assemble_image(
            tiles.depth, tx, ty, cam.width, cam.height, tile=config.tile
        )
        img_alpha = blend_ref.assemble_image(
            tiles.alpha, tx, ty, cam.width, cam.height, tile=config.tile
        )
    img_color = img_color + (1.0 - img_alpha)[..., None] * bg

    # fused path runs at the padded capacity; radii report the true one
    radii = splats.radius[: g.capacity] if use_fused else splats.radius
    return RenderOutput(
        color=img_color,
        depth=img_depth,
        alpha=img_alpha,
        radii=radii,
        overflow=binned.overflow,
    )


def rasterize_rows(
    packed_rows: jax.Array,
    cam: Camera,
    bg: jax.Array | None = None,
    config: RasterConfig = RasterConfig(),
) -> RenderOutput:
    """Render directly from a field-major scene-rows layout
    (``preprocess_pallas.pack_scene_rows`` / ``concat_rows``) without a
    ``Gaussians`` pytree — the inference fast path for merged scenes
    (e.g. background + per-frame shaded object splats in ONE pass).

    Requires the Pallas backend with ``feature_pack="bf16"``; radii are
    reported at the padded row capacity.
    """
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    from autovfx_tpu.ops import blend_pallas
    from autovfx_tpu.ops import preprocess_pallas as PP

    n_pad = packed_rows.shape[1] * 128
    ps = PP.preprocess_packed(
        packed_rows, n_pad, cam, tile=config.tile,
        scaling_modifier=config.scaling_modifier,
        feat_rows=6 if config.feature_pack == "bf16x" else 8,
    )
    splats, feat_g = ps.splats, ps.feat
    compact = _pad_mode() == "none"
    binned = binning.bin_splats(
        splats, cam.width, cam.height, config.dup_budget,
        tile=config.tile, chunk=config.chunk,
        pad_mode="none" if compact else "chunk",
    )
    gid = binned.gid
    if compact:
        gid = jnp.concatenate(
            [gid,
             jnp.full((config.chunk,), feat_g.shape[1] - 1, jnp.int32)]
        )
    feat_dup = feat_g[:, gid]
    tx, ty = binned.num_tiles_x, binned.num_tiles_y
    out_rows = blend_pallas._blend_fwd_call(
        feat_dup, binned.tile_start, binned.tile_chunks,
        tx * ty, tx, config.tile, config.chunk,
        tile_count=binned.tile_count if compact else None,
    )
    rows = blend_ref.assemble_rows(
        out_rows, tx, ty, cam.width, cam.height, tile=config.tile
    )
    img_color = jnp.moveaxis(rows[0:3], 0, -1)
    img_alpha = rows[4]
    img_color = img_color + (1.0 - img_alpha)[..., None] * bg
    return RenderOutput(
        color=img_color,
        depth=rows[3],
        alpha=img_alpha,
        radii=splats.radius,
        overflow=binned.overflow,
    )


def rasterize_rows_pair(
    rows_a: jax.Array,
    rows_b: jax.Array,
    cam: Camera,
    bg: jax.Array | None = None,
    config: RasterConfig = RasterConfig(),
) -> RenderOutput:
    """Merged render of two scene-rows layouts (see rasterize_rows_multi)."""
    return rasterize_rows_multi([rows_a, rows_b], cam, bg=bg, config=config)


def rasterize_rows_multi(
    rows_list: list,
    cam: Camera,
    bg: jax.Array | None = None,
    config: RasterConfig = RasterConfig(),
) -> RenderOutput:
    """Merged render of N scene-rows layouts (e.g. static background +
    per-frame object splats + per-frame smoke volume) WITHOUT
    concatenating the row arrays: each runs the fused preprocess kernel
    separately and only the small per-splat outputs are concatenated —
    avoids copying the ~240 MB background layout every frame (the
    scene-rows concat costs more than the object pass it feeds)."""
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    from autovfx_tpu.ops import blend_pallas
    from autovfx_tpu.ops import preprocess_pallas as PP

    feat_rows = 6 if config.feature_pack == "bf16x" else 8
    parts = []
    for rows in rows_list:
        n_pad = rows.shape[1] * 128
        parts.append(
            PP.preprocess_packed(
                rows, n_pad, cam, tile=config.tile,
                scaling_modifier=config.scaling_modifier,
                feat_rows=feat_rows,
            )
        )
    feat_g = jnp.concatenate([p.feat for p in parts], axis=1)
    splats = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0),
        *[p.splats for p in parts],
    )
    compact = _pad_mode() == "none"
    binned = binning.bin_splats(
        splats, cam.width, cam.height, config.dup_budget,
        tile=config.tile, chunk=config.chunk,
        pad_mode="none" if compact else "chunk",
    )
    gid = binned.gid
    if compact:
        gid = jnp.concatenate(
            [gid,
             jnp.full((config.chunk,), feat_g.shape[1] - 1, jnp.int32)]
        )
    feat_dup = feat_g[:, gid]
    tx, ty = binned.num_tiles_x, binned.num_tiles_y
    out_rows = blend_pallas._blend_fwd_call(
        feat_dup, binned.tile_start, binned.tile_chunks,
        tx * ty, tx, config.tile, config.chunk,
        tile_count=binned.tile_count if compact else None,
    )
    rows = blend_ref.assemble_rows(
        out_rows, tx, ty, cam.width, cam.height, tile=config.tile
    )
    img_color = jnp.moveaxis(rows[0:3], 0, -1)
    img_alpha = rows[4]
    img_color = img_color + (1.0 - img_alpha)[..., None] * bg
    return RenderOutput(
        color=img_color,
        depth=rows[3],
        alpha=img_alpha,
        radii=splats.radius,
        overflow=binned.overflow,
    )


class RenderDict(NamedTuple):
    """Full reference-render bundle (gaussian_renderer.render parity)."""

    rgba: jax.Array  # (H, W, 4)
    depth: jax.Array  # (H, W)
    normal: jax.Array  # (H, W, 3) normalized
    radii: jax.Array  # (N,)
    overflow: jax.Array


def render(
    g: Gaussians,
    cam: Camera,
    bg: jax.Array | None = None,
    config: RasterConfig = RasterConfig(),
    with_normal: bool = True,
    mean2d_offset: jax.Array | None = None,
) -> RenderDict:
    """RGBA + depth + normal render matching gaussian_renderer.render().

    The normal image is a second rasterization pass with per-Gaussian
    normals (min-scale axis, viewer-facing) encoded as colors
    (gaussian_renderer/__init__.py:166-194).
    """
    out = rasterize(
        g, cam, bg=bg, config=config, mean2d_offset=mean2d_offset
    )
    rgba = jnp.concatenate([out.color, out.alpha[..., None]], axis=-1)
    if with_normal:
        dirs = g.xyz - cam.center[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        normals01 = g.normals(view_dirs=dirs) * 0.5 + 0.5
        n_out = rasterize(
            g, cam, bg=None, config=config, override_color=normals01
        )
        normal = (n_out.color - 0.5) * 2.0
        normal = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
        )
    else:
        normal = jnp.zeros_like(out.color)
    return RenderDict(
        rgba=rgba,
        depth=out.depth,
        normal=normal,
        radii=out.radii,
        overflow=out.overflow,
    )
