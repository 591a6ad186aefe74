"""Production TPU tile-blend kernel (Pallas).

Parity target: ``cuda_rasterizer/forward.cu`` renderCUDA (:261-378) and
``backward.cu`` renderCUDA (:416-599) — same skip rules, 0.99 clamp,
test_T < 1e-4 done-freeze, and output semantics as blend_ref.py.

TPU-first design (vs CUDA's one-thread-per-pixel sequential loop):
- The per-(splat, pixel) Gaussian falloff is a *matmul*: power = Wᵀ B,
  where W (6, CHUNK) holds per-splat quadratic coefficients in
  tile-relative pixel coordinates and B (6, 256) is the fixed quadratic
  pixel basis [1, x, y, x², xy, y²] of a 16×16 tile — MXU work.  W is
  assembled *inside the kernel* from raw per-splat rows (mean2d, conic),
  so the HBM feature buffer is per-GAUSSIAN data gathered once — no
  per-duplicate packing pass in XLA.
- Per-splat scalars (log-opacity) broadcast along pixels as rank-1
  outer products with a ones row — no lane↔sublane transposes.
- Front-to-back compositing becomes a prefix sum of log(1-α) along the
  depth-sorted chunk, computed as a strictly-lower-triangular ones
  matmul on the MXU (beats a VPU shift-ladder scan).
- The CUDA early-stop (test_T < 1e-4 ⇒ done) is exact without a second
  scan: test_T is monotone within a tile, so the frozen transmittance is
  ``exc_hat = max(exc_raw, frozen_val)`` with a single masked reduction.
- Chunks of 256 duplicates are double-buffer DMA'd from the HBM-resident
  sorted splat buffer (transposed (16, K) layout so chunk slices are
  lane-aligned); a tile exits its chunk loop once every pixel saturates,
  draining the in-flight prefetch DMA first.

Feature rows (built per-gaussian by ``pack_gaussian_features``, gathered
to duplicates by one (16, K) column gather whose VJP is the segment-sum
that replaces backward.cu's atomicAdd):
  0 mean2d_x (abs px)   4 conic_c      8 b
  1 mean2d_y            5 log-opacity  9 view depth
  2 conic_a             6 r
  3 conic_b             7 g
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autovfx_tpu.ops.binning import CHUNK, BinnedSplats
from autovfx_tpu.ops.blend_ref import (
    ALPHA_MAX,
    ALPHA_MIN,
    T_EPS,
    TileImages,
)
from autovfx_tpu.ops.projection import TILE, Splats2D

FEAT = 16  # packed feature rows (f32 mode)
FEAT8 = 8  # bf16-paired fast mode: gathers of <=8 sublanes run 1.6x faster
# 6-row mode: conic (a|b), (c|log-op) additionally bf16-paired — the
# K-sized gather is the pipeline's HBM bottleneck, and conic precision
# only enters through exp(-q/2): dα/α = q·2⁻⁹/2 < 0.5 % where α matters
FEAT6 = 6
OUT_ROWS = 8  # [r, g, b, depth, alpha, 0, 0, 0]
NEG_INF = -1e30
LOG_OP_MIN = -100.0  # stand-in for log(0) on inert slots
LOG_T_EPS = -9.210340371976182  # log(T_EPS): freeze test in log space


def _pixel_basis(tile: int = TILE):
    """(6, tile²) quadratic basis over tile-local pixel coords."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, tile * tile), 1)
    rx = (p % tile).astype(jnp.float32)
    ry = (p // tile).astype(jnp.float32)
    return jnp.concatenate(
        [jnp.ones_like(rx), rx, ry, rx * rx, rx * ry, ry * ry], axis=0
    )


def _tri_strict(chunk: int = CHUNK):
    """(chunk, chunk) strictly-lower-triangular ones (prefix-sum matmul)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (j < i).astype(jnp.float32)


def _outer(row, ones_p):
    """(1, C) per-splat scalars -> (C, P) broadcast via rank-1 matmul."""
    return jax.lax.dot_general(
        row,
        ones_p,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _assemble_w(f, ox, oy):
    """(6, C) quadratic coefficients from raw rows, tile-local coords."""
    mx = f[0:1] - ox
    my = f[1:2] - oy
    ca = f[2:3]
    cb = f[3:4]
    cc = f[4:5]
    w0 = -0.5 * (ca * mx * mx + cc * my * my) - cb * mx * my
    w1 = ca * mx + cb * my
    w2 = cb * mx + cc * my
    return jnp.concatenate([w0, w1, w2, -0.5 * ca, -cb, -0.5 * cc], axis=0)


def _chunk_alpha(f, basis, ones_p, ox, oy, lop_extra=None):
    """Shared fwd/bwd: per-chunk alpha (C, P) + unclamped + ok mask.

    ``lop_extra``: optional (1, C) lane-dim additive term on the
    log-opacity row (compact-segment edge masking: -inf kills the
    duplicate exactly through the alpha >= 1/255 skip rule)."""
    w = _assemble_w(f, ox, oy)
    power = jax.lax.dot_general(
        w,
        basis,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (C, P)
    lop_row = f[5:6] if lop_extra is None else f[5:6] + lop_extra
    lop = _outer(lop_row, ones_p)
    a_un = jnp.exp(power + lop)  # op * exp(power), fused
    alpha = jnp.minimum(ALPHA_MAX, a_un)
    ok = (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(ok, alpha, 0.0)
    return alpha, a_un, ok


def _unpack_bf16_pair(row):
    """(1, C) f32 holding two bf16s -> ((1, C) hi-f32, (1, C) lo-f32)."""
    u = jax.lax.bitcast_convert_type(row, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32
    )
    lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return hi, lo


def _fwd_kernel(
    tile_start_ref, tile_chunks_ref, feat_ref, out_ref, fbuf, sems,
    *, tiles_x: int, tile: int, chunk: int, packed: bool = False,
    packed6: bool = False, prefix_split: int = 4,
    exact_freeze: bool = True,
):
    """``exact_freeze=False`` (packed fast path): skip the per-(dup,
    pixel) test_T<1e-4 freeze chain (~7 of ~20 VPU ops/pair) and exit
    at CHUNK granularity once every pixel's T < 1e-4 instead.  The
    total contribution a pixel can receive after crossing T_EPS is
    bounded by its remaining transmittance (Σ_{j>i} α_j·T_j ≤ T_i <
    1e-4), so color/alpha deviate from the CUDA freeze semantics by
    < 1e-4 — far below the bf16 color quantization this path already
    carries.  The f32/training path keeps the exact freeze."""
    _fwd_body(
        tile_start_ref, None, tile_chunks_ref, feat_ref, out_ref, fbuf,
        sems, tiles_x=tiles_x, tile=tile, chunk=chunk, packed=packed,
        packed6=packed6, prefix_split=prefix_split,
        exact_freeze=exact_freeze,
    )


def _fwd_kernel_compact(
    tile_start_ref, tile_count_ref, tile_chunks_ref, feat_ref, out_ref,
    fbuf, sems, *, tiles_x: int, tile: int, chunk: int,
    packed: bool = False, packed6: bool = False, prefix_split: int = 4,
    exact_freeze: bool = True,
):
    """Pad-free segment variant (binning pad_mode="none"): tile_start
    is the EXACT unaligned segment start; chunk DMAs start at the
    chunk-floor and the partial leading/trailing edges are masked to
    alpha=0 (inert in both the transmittance prefix and the contrib
    matmul), so no pad entries exist anywhere in the pipeline."""
    _fwd_body(
        tile_start_ref, tile_count_ref, tile_chunks_ref, feat_ref,
        out_ref, fbuf, sems, tiles_x=tiles_x, tile=tile, chunk=chunk,
        packed=packed, packed6=packed6, prefix_split=prefix_split,
        exact_freeze=exact_freeze,
    )


def _fwd_body(
    tile_start_ref, tile_count_ref, tile_chunks_ref, feat_ref, out_ref,
    fbuf, sems, *, tiles_x: int, tile: int, chunk: int, packed: bool,
    packed6: bool, prefix_split: int, exact_freeze: bool,
):
    P = tile * tile  # noqa: N806
    t = pl.program_id(0)
    start = tile_start_ref[t]
    n_chunks = tile_chunks_ref[t]
    if tile_count_ref is not None:  # compact: floor-align the DMA base
        seg_end = start + tile_count_ref[t]
        seg_base = (start // chunk) * chunk
    else:
        seg_base = start
    ox = ((t % tiles_x) * tile).astype(jnp.float32)
    oy = ((t // tiles_x) * tile).astype(jnp.float32)

    basis = _pixel_basis(tile)
    tri = _tri_strict(max(chunk // prefix_split, 8))
    ones_p = jnp.ones((1, P), jnp.float32)

    def chunk_dma(slot, c):
        off = pl.multiple_of(seg_base + c * chunk, chunk)
        src = feat_ref.at[:, pl.ds(off, chunk)]
        return pltpu.make_async_copy(src, fbuf.at[slot], sems.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        chunk_dma(0, 0).start()

    def cond(state):
        c, logT, done, acc = state
        return (c < n_chunks) & (jnp.min(done) < 0.5)

    def body(state):
        c, logT, done, acc = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_dma(1 - slot, c + 1).start()

        chunk_dma(slot, c).wait()
        f = fbuf[slot]  # (FEAT, FEAT8 or FEAT6, CHUNK)
        if tile_count_ref is not None:
            # mask the partial leading/trailing chunk edges (neighbors'
            # duplicates share the floor-aligned chunks) by adding -inf
            # to the LOG-OPACITY row: the chunk dim is the LANE dim of
            # the feature rows, so this is a handful of native (1, C)
            # lane ops.  (A (C, 1) sublane mask multiplied into the
            # (C, P) alpha measured +2.5 ms/frame: sublane iota +
            # broadcast relayouts per chunk.)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            idx = seg_base + c * chunk + lane
            edge = jnp.where(
                (idx >= start) & (idx < seg_end), 0.0, NEG_INF
            )  # (1, C)
        else:
            edge = None
        if packed6:
            ca, cb = _unpack_bf16_pair(f[2:3])
            cc, lop = _unpack_bf16_pair(f[3:4])
            if edge is not None:
                lop = lop + edge
                edge = None
            f_alpha = jnp.concatenate(
                [f[0:2], ca, cb, cc, lop], axis=0
            )
        else:
            f_alpha = f
        alpha, _, _ = _chunk_alpha(
            f_alpha, basis, ones_p, ox, oy, lop_extra=edge
        )
        lg = jnp.log1p(-alpha)
        # fast (packed) mode runs the prefix/contrib matmuls at default
        # bf16 MXU precision (~0.4% on T — below 8-bit display quanta)
        prec = (
            jax.lax.Precision.DEFAULT
            if packed
            else jax.lax.Precision.HIGHEST
        )
        # hierarchical prefix: a (C, C) strict-tri matmul contracts over
        # all C duplicates; splitting into G groups of S cuts the MXU
        # work to G·S²·P + G group-total adds (exact same math)
        groups = chunk // tri.shape[0]
        exc_parts = []
        base = jnp.zeros((1, P), jnp.float32)
        s = tri.shape[0]
        for gi in range(groups):
            lg_g = jax.lax.slice_in_dim(lg, gi * s, (gi + 1) * s, axis=0)
            exc_g = jax.lax.dot_general(
                tri,
                lg_g,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            exc_parts.append(exc_g + base)
            base = base + jnp.sum(lg_g, axis=0, keepdims=True)
        exc = jnp.concatenate(exc_parts, axis=0)
        exc_raw = exc + logT
        if exact_freeze:
            # freeze test in log space (exp is monotone): saves one
            # (C, P) transcendental per chunk vs exp(exc_raw)*(1-α) < T_EPS
            cond_f = (exc_raw + lg < LOG_T_EPS) | (done > 0.5)
            frozen = jnp.max(
                jnp.where(cond_f, exc_raw, NEG_INF), axis=0, keepdims=True
            )
            exc_hat = jnp.maximum(exc_raw, frozen)
            w = jnp.where(cond_f, 0.0, alpha) * jnp.exp(exc_hat)
        else:
            w = alpha * jnp.exp(exc_raw)
        if packed6:
            r_row, g_row = _unpack_bf16_pair(f[4:5])
            b_row, d_row = _unpack_bf16_pair(f[5:6])
            rgbd = jnp.concatenate([r_row, g_row, b_row, d_row], axis=0)
        elif packed:
            r_row, g_row = _unpack_bf16_pair(f[6:7])
            b_row, d_row = _unpack_bf16_pair(f[7:8])
            rgbd = jnp.concatenate([r_row, g_row, b_row, d_row], axis=0)
        else:
            rgbd = f[6:10]
        contrib = jax.lax.dot_general(
            rgbd,
            w,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (4, P)
        acc = acc + jnp.concatenate(
            [contrib, jnp.zeros((OUT_ROWS - 4, P), jnp.float32)],
            axis=0,
        )
        # base already holds Σ lg over the whole chunk
        if exact_freeze:
            logT_new = jnp.maximum(logT + base, frozen)
            done_new = jnp.maximum(
                done,
                jnp.max(cond_f.astype(jnp.float32), axis=0, keepdims=True),
            )
        else:
            logT_new = logT + base
            done_new = (logT_new < LOG_T_EPS).astype(jnp.float32)
        return c + 1, logT_new, done_new, acc

    init = (
        jnp.int32(0),
        jnp.zeros((1, P), jnp.float32),
        jnp.zeros((1, P), jnp.float32),
        jnp.zeros((OUT_ROWS, P), jnp.float32),
    )
    c_fin, logT, _, acc = jax.lax.while_loop(cond, body, init)

    # Early exit leaves the prefetched chunk's DMA in flight; wait for it
    # before the next grid step reuses the scratch buffers (otherwise the
    # semaphore state corrupts and the device aborts).
    @pl.when(c_fin < n_chunks)
    def _():
        chunk_dma(jax.lax.rem(c_fin, 2), c_fin).wait()

    alpha_row = 1.0 - jnp.exp(logT)  # (1, P)
    row = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, 1), 0)
    out_ref[0] = jnp.where(row == 4, alpha_row, acc)


def _group_select(groups: int, chunk: int):
    """(G, C) selection matrix picking the last row of each 8-group."""
    g = jax.lax.broadcasted_iota(jnp.int32, (groups, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (groups, chunk), 1)
    return (c == g * 8 + 7).astype(jnp.float32)


def _group_repeat(chunk: int, groups: int):
    """(C, G) matrix broadcasting per-group rows back to all 8 slots."""
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, groups), 0)
    g = jax.lax.broadcasted_iota(jnp.int32, (chunk, groups), 1)
    return (c // 8 == g).astype(jnp.float32)


def _mm_f32(a, b):
    """Exact-f32 MXU matmul (selection/prefix matrices are 0/1)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _fwd_kernel_v3(
    tile_start_ref, tile_chunks_ref, feat_ref, out_ref, fbuf, sems,
    *, tiles_x: int, tile: int, chunk: int, packed: bool = False,
    packed6: bool = False,
):
    """Linear-space transmittance forward blend.

    Same semantics as ``_fwd_kernel`` (forward.cu renderCUDA parity:
    skip rules, 0.99 clamp, test_T<1e-4 freeze) but the front-to-back
    transmittance is tracked as *products* instead of log-sums:

    - per-(dup,pixel) work drops from 3 transcendental passes
      (exp, log1p — 13.8x a mul on v5e — and a second exp) to ONE exp;
    - within sublane-groups of 8 the prefix Π(1-α) is an exact
      segmented Hillis-Steele shift-multiply scan (3 rolls);
    - across groups the prefix runs in log space at 1/8 density
      (log+exp on (C/8, P) only), via an exact-f32 strict-triangular
      MXU matmul;
    - the freeze test becomes ``T_i·(1-α_i) < T_EPS`` directly
      (test_T is monotone within a tile, so the frozen transmittance
      is a single masked max — no second scan), and the final alpha is
      ``1 - T`` with no log/exp at all.

    Numerically *tighter* than the log-space packed path: the group
    products are exact f32 (≤8 terms each ≥ 0.01), and the 1/8-density
    log prefix uses f32-HIGHEST matmuls instead of bf16.
    """
    P = tile * tile  # noqa: N806
    G = chunk // 8  # noqa: N806 — sublane groups per chunk
    t = pl.program_id(0)
    start = tile_start_ref[t]
    n_chunks = tile_chunks_ref[t]
    ox = ((t % tiles_x) * tile).astype(jnp.float32)
    oy = ((t // tiles_x) * tile).astype(jnp.float32)

    basis = _pixel_basis(tile)
    ones_p = jnp.ones((1, P), jnp.float32)
    gsel = _group_select(G, chunk)
    grep = _group_repeat(chunk, G)
    tri_g = _tri_strict(G)
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) % 8

    def chunk_dma(slot, c):
        off = pl.multiple_of(start + c * chunk, chunk)
        src = feat_ref.at[:, pl.ds(off, chunk)]
        return pltpu.make_async_copy(src, fbuf.at[slot], sems.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        chunk_dma(0, 0).start()

    def cond(state):
        c, T, done, acc = state
        return (c < n_chunks) & (jnp.min(done) < 0.5)

    def body(state):
        c, T, done, acc = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_dma(1 - slot, c + 1).start()

        chunk_dma(slot, c).wait()
        f = fbuf[slot]
        if packed6:
            ca, cb = _unpack_bf16_pair(f[2:3])
            cc, lop = _unpack_bf16_pair(f[3:4])
            f_alpha = jnp.concatenate([f[0:2], ca, cb, cc, lop], axis=0)
        else:
            f_alpha = f
        alpha, _, _ = _chunk_alpha(f_alpha, basis, ones_p, ox, oy)
        om = 1.0 - alpha  # in [0.01, 1]

        # segmented shift-multiply scan: inclusive cumprod within each
        # 8-row group (circular wrap is masked off by the row%8 tests).
        # pltpu.roll is Mosaic's native sublane rotate; jnp.roll lowers
        # to unaligned sublane slices that abort at runtime on real TPUs
        # (InvalidArgument) even though they interpret fine.
        x = om
        x = x * jnp.where(rows >= 1, pltpu.roll(x, 1, 0), 1.0)
        x = x * jnp.where(rows >= 2, pltpu.roll(x, 2, 0), 1.0)
        cp = x * jnp.where(rows >= 4, pltpu.roll(x, 4, 0), 1.0)
        excl = jnp.where(rows >= 1, pltpu.roll(cp, 1, 0), 1.0)

        gp = _mm_f32(gsel, cp)  # (G, P) inclusive group products
        lgp = jnp.log(gp)  # >= 8·log(0.01): no underflow
        pre = _mm_f32(tri_g, lgp)  # exclusive prefix across groups
        t_base = jnp.exp(pre) * T  # (G, P); T (1, P) broadcasts
        t_exc = _mm_f32(grep, t_base) * excl  # T before each duplicate
        t_after = t_exc * om
        cond_f = (t_after < T_EPS) | (done > 0.5)
        w = jnp.where(cond_f, 0.0, alpha) * t_exc

        if packed6:
            r_row, g_row = _unpack_bf16_pair(f[4:5])
            b_row, d_row = _unpack_bf16_pair(f[5:6])
            rgbd = jnp.concatenate([r_row, g_row, b_row, d_row], axis=0)
        elif packed:
            r_row, g_row = _unpack_bf16_pair(f[6:7])
            b_row, d_row = _unpack_bf16_pair(f[7:8])
            rgbd = jnp.concatenate([r_row, g_row, b_row, d_row], axis=0)
        else:
            rgbd = f[6:10]
        prec = (
            jax.lax.Precision.DEFAULT
            if packed
            else jax.lax.Precision.HIGHEST
        )
        contrib = jax.lax.dot_general(
            rgbd, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (4, P)
        acc = acc + jnp.concatenate(
            [contrib, jnp.zeros((OUT_ROWS - 4, P), jnp.float32)], axis=0
        )

        # T freezes at its value just before the first frozen duplicate
        # (monotone decrease => masked max); otherwise the full product
        frozen = jnp.max(
            jnp.where(cond_f, t_exc, 0.0), axis=0, keepdims=True
        )
        t_end = (
            jax.lax.slice_in_dim(t_base, G - 1, G, axis=0)
            * jax.lax.slice_in_dim(gp, G - 1, G, axis=0)
        )
        T_new = jnp.maximum(t_end, frozen)
        done_new = jnp.maximum(
            done,
            jnp.max(cond_f.astype(jnp.float32), axis=0, keepdims=True),
        )
        return c + 1, T_new, done_new, acc

    init = (
        jnp.int32(0),
        jnp.ones((1, P), jnp.float32),
        jnp.zeros((1, P), jnp.float32),
        jnp.zeros((OUT_ROWS, P), jnp.float32),
    )
    c_fin, T, _, acc = jax.lax.while_loop(cond, body, init)

    @pl.when(c_fin < n_chunks)
    def _():
        chunk_dma(jax.lax.rem(c_fin, 2), c_fin).wait()

    alpha_row = 1.0 - T
    row = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, 1), 0)
    out_ref[0] = jnp.where(row == 4, alpha_row, acc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _blend_core(feat, tile_start, tile_chunks, n_tiles, tiles_x, tile,
                chunk):
    return _blend_fwd_call(
        feat, tile_start, tile_chunks, n_tiles, tiles_x, tile, chunk
    )


def _blend_fwd_call(feat, tile_start, tile_chunks, n_tiles, tiles_x, tile,
                    chunk, algo: str | None = None, tile_count=None):
    """``tile_count`` given => pad-free compact segments (binning
    pad_mode="none"): tile_start is exact/unaligned and the kernel
    masks chunk edges.  ``feat`` must then carry >= chunk extra inert
    columns past the last live duplicate (the floor-aligned final DMA
    can read up to chunk-1 slots beyond the last segment end)."""
    import os

    if algo is None:
        # packed inference defaults to the chunk-freeze fast kernel;
        # the f32/training path keeps exact CUDA freeze semantics
        fr = feat.shape[0]
        default = "fast" if fr in (FEAT8, FEAT6) else "log"
        algo = os.environ.get("AUTOVFX_BLEND_ALGO", default)
    P = tile * tile  # noqa: N806
    feat_rows = feat.shape[0]
    packed = feat_rows == FEAT8
    packed6 = feat_rows == FEAT6
    if packed6:
        # Mosaic DMA slices must be 8-sublane aligned: pad the 6 packed
        # rows with two zero rows.  (A natively-(6, K) array DMA'd
        # full-extent fails Mosaic compile too — r4 on-chip evidence;
        # and the gather is index-rate-bound, so bf16x measured 39.8 vs
        # bf16's 44.3 FPS at Garden scale: kept only for the record.)
        feat = jnp.concatenate(
            [feat, jnp.zeros((2, feat.shape[1]), feat.dtype)], axis=0
        )
        feat_rows = FEAT8
    fbuf_shape = (2, feat_rows, chunk)
    compact = tile_count is not None
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if compact else 2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, OUT_ROWS, P),
            lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(fbuf_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    if algo == "linear":
        if compact:
            raise ValueError(
                "compact segments are not wired into the linear v3 "
                "kernel (use algo='fast'/'log' with pad_mode='none')"
            )
        kernel = functools.partial(_fwd_kernel_v3)
    elif compact:
        kernel = functools.partial(
            _fwd_kernel_compact, exact_freeze=algo != "fast"
        )
    else:
        kernel = functools.partial(
            _fwd_kernel, exact_freeze=algo != "fast"
        )
    call = pl.pallas_call(
        functools.partial(
            kernel, tiles_x=tiles_x, tile=tile, chunk=chunk,
            packed=packed or packed6, packed6=packed6,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, OUT_ROWS, P), jnp.float32
        ),
        grid_spec=grid_spec,
    )
    if compact:
        return call(tile_start, tile_count, tile_chunks, feat)
    return call(tile_start, tile_chunks, feat)


def _blend_fwd_rule(feat, tile_start, tile_chunks, n_tiles, tiles_x, tile,
                    chunk):
    out = _blend_fwd_call(
        feat, tile_start, tile_chunks, n_tiles, tiles_x, tile, chunk
    )
    return out, (feat, tile_start, tile_chunks)


def _blend_bwd_rule(n_tiles, tiles_x, tile, chunk, res, g_out):
    from autovfx_tpu.ops.blend_pallas_bwd import blend_bwd_call

    feat, tile_start, tile_chunks = res
    d_feat = blend_bwd_call(
        feat, tile_start, tile_chunks, g_out, n_tiles, tiles_x, tile, chunk
    )
    return d_feat, None, None


_blend_core.defvjp(_blend_fwd_rule, _blend_bwd_rule)


def _pack_bf16_pair(a, b):
    """Two f32 rows -> one f32 row holding (bf16(a) | bf16(b)).

    The hi half must keep a nonzero exponent: if a == 0 the packed word
    is a denormal f32 bit pattern and TPU flush-to-zero wipes the lo
    half in transit.  Clamping a to the smallest normal f32 costs
    ~1e-38 of absolute error (a is a color/depth, non-negative)."""
    a = jnp.maximum(a, jnp.float32(1.1754944e-38))
    ha = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16).astype(jnp.float32), jnp.uint32
    ) & jnp.uint32(0xFFFF0000)
    hb = (
        jax.lax.bitcast_convert_type(
            b.astype(jnp.bfloat16).astype(jnp.float32), jnp.uint32
        )
        >> 16
    )
    return jax.lax.bitcast_convert_type(ha | hb, jnp.float32)


def pack_gaussian_features_8(splats: Splats2D) -> jax.Array:
    """(8, N+1) fast-mode rows: geometry f32, colors/depth bf16-paired.

    The duplicate gather runs ~1.6x faster at <=8 sublanes, and bf16
    color error (~0.4%) is below the 8-bit display quantum.  Inference
    only — the custom VJP covers the 16-row layout."""
    full = pack_gaussian_features(splats)  # (16, N+1)
    return jnp.concatenate(
        [
            full[0:6],
            _pack_bf16_pair(full[6], full[7])[None, :],
            _pack_bf16_pair(full[8], full[9])[None, :],
        ],
        axis=0,
    )


def pack_gaussian_features_6(splats: Splats2D) -> jax.Array:
    """(6, N+1) leanest rows: mean2d f32, conic+log-op AND colors/depth
    bf16-paired — cuts the K-sized duplicate gather (the HBM
    bottleneck) another 25 % vs the 8-row mode.  Inference only."""
    full = pack_gaussian_features(splats)  # (16, N+1)
    return jnp.concatenate(
        [
            full[0:2],
            _pack_bf16_pair(full[2], full[3])[None, :],
            _pack_bf16_pair(full[4], full[5])[None, :],
            _pack_bf16_pair(full[6], full[7])[None, :],
            _pack_bf16_pair(full[8], full[9])[None, :],
        ],
        axis=0,
    )


def pack_gaussian_features(splats: Splats2D) -> jax.Array:
    """(16, N+1) per-gaussian feature rows (original order — binning's
    gid already maps duplicates to original ids) + inert dummy column N
    (differentiable JAX; O(N) not O(K))."""
    mean2d = splats.mean2d
    conic = splats.conic
    color = splats.color
    opacity = splats.opacity
    depth = splats.depth
    lop = jnp.where(
        opacity > 0, jnp.log(jnp.maximum(opacity, 1e-37)), LOG_OP_MIN
    )
    n = mean2d.shape[0]
    feat = jnp.stack(
        [
            mean2d[:, 0],
            mean2d[:, 1],
            conic[:, 0],
            conic[:, 1],
            conic[:, 2],
            lop,
            color[:, 0],
            color[:, 1],
            color[:, 2],
            depth,
        ],
        axis=0,
    )  # (10, N)
    feat = jnp.concatenate(
        [feat, jnp.zeros((FEAT - feat.shape[0], n), jnp.float32)], axis=0
    )
    dummy = jnp.zeros((FEAT, 1), jnp.float32).at[5, 0].set(LOG_OP_MIN)
    return jnp.concatenate([feat, dummy], axis=1)  # (16, N+1)


def blend_tiles_pallas(
    binned: BinnedSplats, feat_dup, tile: int = TILE, chunk: int = CHUNK
) -> TileImages:
    """feat_dup: (16, K) duplicate features (already gathered)."""
    n_tiles = binned.num_tiles_x * binned.num_tiles_y
    out = _blend_core(
        feat_dup,
        binned.tile_start,
        binned.tile_chunks,
        n_tiles,
        binned.num_tiles_x,
        tile,
        chunk,
    )  # (T, 8, tile²)
    return TileImages(
        color=jnp.moveaxis(out[:, 0:3, :], 1, 2),  # (T, 256, 3)
        depth=out[:, 3, :],
        alpha=out[:, 4, :],
    )
