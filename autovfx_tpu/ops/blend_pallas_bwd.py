"""Backward Pallas kernel for the tile blend.

Parity target: ``backward.cu`` renderCUDA (:416-599) including the
depth/alpha gradient extensions (:555-562) and CUDA's straight-through
treatment of the 0.99 alpha clamp (dL/dG = op·dL/dα regardless).

Per-pixel math (derived from C = Σ w_j c_j, w_j = α_j·T_j,
D = Σ w_j d_j, A = 1 - T_N, f_j ≝ g_C·c_j + g_D·d_j):

    dL/dα_k = T_k f_k − (S_k − g_A·T_N) / (1−α_k),   S_k = Σ_{j>k} w_j f_j
    dL/dpower_k = α_unclamped·dL/dα_k                  (CUDA convention)

TPU-first: instead of CUDA's back-to-front atomicAdd replay, two forward
passes over the chunk-aligned depth-sorted list: pass A accumulates
F_total = Σ w f and the final transmittance; pass B computes
S_k = F_total − prefix_incl(w f) with the same MXU triangular-matmul
prefix sums as the forward, reduces per-duplicate gradients with MXU
contractions against the pixel basis, chains them through the in-kernel
W assembly back to raw feature rows (mean2d, conic, log-opacity, rgb,
depth), and DMA-writes per-chunk gradient blocks (race-free because tile
ranges are CHUNK-aligned).  The output buffer is zero-initialized via
input/output aliasing so early-exited chunks stay zero.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autovfx_tpu.ops.binning import CHUNK
from autovfx_tpu.ops.blend_pallas import (
    FEAT,
    NEG_INF,
    OUT_ROWS,
    _chunk_alpha,
    _pixel_basis,
    _tri_strict,
)
from autovfx_tpu.ops.blend_ref import T_EPS
from autovfx_tpu.ops.projection import TILE


def _tri_incl(chunk: int = CHUNK):
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (j <= i).astype(jnp.float32)


def _mm(a, b, contract):
    return jax.lax.dot_general(
        a,
        b,
        (contract, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _bwd_kernel(
    tile_start_ref,
    tile_chunks_ref,
    feat_ref,
    g_out_ref,
    _zeros_ref,
    d_feat_ref,
    fbuf,
    gbuf,
    sems,
    wsem,
    *,
    tiles_x: int,
    tile: int,
    chunk: int,
):
    P = tile * tile  # noqa: N806
    t = pl.program_id(0)
    start = tile_start_ref[t]
    n_chunks = tile_chunks_ref[t]
    ox = ((t % tiles_x) * tile).astype(jnp.float32)
    oy = ((t // tiles_x) * tile).astype(jnp.float32)

    basis = _pixel_basis(tile)
    tri_s = _tri_strict(chunk)
    tri_i = _tri_incl(chunk)
    ones_p = jnp.ones((1, P), jnp.float32)

    gvec = g_out_ref[0, 0:4, :]  # (4, P) rgb+depth grads
    g_alpha = g_out_ref[0, 4:5, :]  # (1, P)

    def chunk_dma(slot, c):
        off = pl.multiple_of(start + c * chunk, chunk)
        return pltpu.make_async_copy(
            feat_ref.at[:, pl.ds(off, chunk)],
            fbuf.at[slot],
            sems.at[slot],
        )

    def chunk_state(f, logT, done):
        """Shared per-chunk recompute: alpha, weights, masks, wf."""
        alpha, a_un, ok = _chunk_alpha(f, basis, ones_p, ox, oy)
        lg = jnp.log1p(-alpha)
        exc_raw = _mm(tri_s, lg, ((1,), (0,))) + logT
        cond_f = (jnp.exp(exc_raw) * (1.0 - alpha) < T_EPS) | (done > 0.5)
        frozen = jnp.max(
            jnp.where(cond_f, exc_raw, NEG_INF), axis=0, keepdims=True
        )
        t_hat = jnp.exp(jnp.maximum(exc_raw, frozen))  # T_k
        live = jnp.logical_not(cond_f) & ok  # CUDA `continue` rules
        w = jnp.where(live, alpha, 0.0) * t_hat
        f_pix = _mm(f[6:10], gvec, ((0,), (0,)))  # (C, P): f_kp
        wf = w * f_pix
        logT_new = jnp.maximum(logT + jnp.sum(lg, axis=0, keepdims=True),
                               frozen)
        done_new = jnp.maximum(
            done, jnp.max(cond_f.astype(jnp.float32), axis=0, keepdims=True)
        )
        return alpha, a_un, live, t_hat, w, f_pix, wf, logT_new, done_new

    # ---- pass A: total Σ w·f and final transmittance -----------------------
    @pl.when(n_chunks > 0)
    def _():
        chunk_dma(0, 0).start()

    def cond_a(state):
        c, logT, done, ftot = state
        return (c < n_chunks) & (jnp.min(done) < 0.5)

    def body_a(state):
        c, logT, done, ftot = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_dma(1 - slot, c + 1).start()

        chunk_dma(slot, c).wait()
        f = fbuf[slot]
        _, _, _, _, _, _, wf, logT_new, done_new = chunk_state(f, logT, done)
        ftot = ftot + jnp.sum(wf, axis=0, keepdims=True)
        return c + 1, logT_new, done_new, ftot

    zero_row = jnp.zeros((1, P), jnp.float32)
    c_fin_a, logT_fin, _, ftot = jax.lax.while_loop(
        cond_a, body_a, (jnp.int32(0), zero_row, zero_row, zero_row)
    )

    @pl.when(c_fin_a < n_chunks)
    def _():
        chunk_dma(jax.lax.rem(c_fin_a, 2), c_fin_a).wait()

    a_term = g_alpha * jnp.exp(logT_fin)  # g_A · T_N  (1, P)

    # ---- pass B: per-duplicate gradients ------------------------------------
    @pl.when(n_chunks > 0)
    def _():
        chunk_dma(0, 0).start()

    def cond_b(state):
        c, logT, done, pinc = state
        return (c < n_chunks) & (jnp.min(done) < 0.5)

    def body_b(state):
        c, logT, done, pinc = state
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_dma(1 - slot, c + 1).start()

        chunk_dma(slot, c).wait()
        f = fbuf[slot]
        (alpha, a_un, live, t_hat, w, f_pix, wf, logT_new, done_new
         ) = chunk_state(f, logT, done)

        pi_k = _mm(tri_i, wf, ((1,), (0,))) + pinc  # inclusive prefix Σ w f
        s_k = ftot - pi_k  # suffix Σ_{j>k} w f
        dl_da = t_hat * f_pix - (s_k - a_term) / (1.0 - alpha)
        dpower = jnp.where(live, a_un * dl_da, 0.0)  # (C, P)

        d_w6 = _mm(basis, dpower, ((1,), (1,)))  # (6, C) dW rows
        d_lop = _mm(ones_p, dpower, ((1,), (1,)))  # (1, C)
        d_cols = _mm(gvec, w, ((1,), (1,)))  # (4, C) rgb+depth grads

        # chain dW -> raw rows (mean2d, conic) through _assemble_w
        mx = f[0:1] - ox
        my = f[1:2] - oy
        ca = f[2:3]
        cb = f[3:4]
        cc = f[4:5]
        dw0 = d_w6[0:1]
        dw1 = d_w6[1:2]
        dw2 = d_w6[2:3]
        dw3 = d_w6[3:4]
        dw4 = d_w6[4:5]
        dw5 = d_w6[5:6]
        w1v = ca * mx + cb * my
        w2v = cb * mx + cc * my
        dmx = -dw0 * w1v + dw1 * ca + dw2 * cb
        dmy = -dw0 * w2v + dw1 * cb + dw2 * cc
        dca = -0.5 * dw0 * mx * mx + dw1 * mx - 0.5 * dw3
        dcb = -dw0 * mx * my + dw1 * my + dw2 * mx - dw4
        dcc = -0.5 * dw0 * my * my + dw2 * my - 0.5 * dw5

        grad = jnp.concatenate(
            [
                dmx,
                dmy,
                dca,
                dcb,
                dcc,
                d_lop,
                d_cols,
                jnp.zeros((FEAT - 10, chunk), jnp.float32),
            ],
            axis=0,
        )  # (FEAT, C)
        gbuf[...] = grad
        off = pl.multiple_of(start + c * chunk, chunk)
        wdma = pltpu.make_async_copy(
            gbuf, d_feat_ref.at[:, pl.ds(off, chunk)], wsem
        )
        wdma.start()
        wdma.wait()

        pinc = pinc + jnp.sum(wf, axis=0, keepdims=True)
        return c + 1, logT_new, done_new, pinc

    c_fin_b, *_ = jax.lax.while_loop(
        cond_b, body_b, (jnp.int32(0), zero_row, zero_row, zero_row)
    )

    @pl.when(c_fin_b < n_chunks)
    def _():
        chunk_dma(jax.lax.rem(c_fin_b, 2), c_fin_b).wait()


def blend_bwd_call(feat, tile_start, tile_chunks, g_out, n_tiles, tiles_x,
                   tile=TILE, chunk=CHUNK):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # feat
            pl.BlockSpec(
                (1, OUT_ROWS, tile * tile),
                lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # g_out
            pl.BlockSpec(memory_space=pl.ANY),  # zeros (aliased to out)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT, chunk), jnp.float32),
            pltpu.VMEM((FEAT, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    zeros = jnp.zeros_like(feat)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x, tile=tile,
                          chunk=chunk),
        out_shape=jax.ShapeDtypeStruct(feat.shape, jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},  # zeros input (after 2 scalar args)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_chunks, feat, g_out, zeros)
