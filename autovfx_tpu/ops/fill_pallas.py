"""Pallas monotone segment-fill: the binning scatter replacement.

Parity target: the duplicate-expansion scatters in binning v2
(``segment_fill_int`` + the group-start histogram/cummax), which
implement cuda_rasterizer/rasterizer_impl.cu:229-271's duplicateWithKeys
expansion.  XLA scatters run ~10 ns/element (scalar-core bound): the
three 1M-element scatters cost ~30 ms/frame at Garden scale.

TPU-first replacement: all fills share ONE sorted, strictly-increasing
``starts`` array, so out[j] = values[g(j)] (g(j) = last group with
start <= j) becomes a *block-diagonal LE-matrix matmul*:

    out[j] = carry + sum_w delta_w * [g*128 <= start_w <= j]

Strict monotonicity bounds the entries per 128-slot output group by
128, so each group's compare matrix is a tiny (128, 256) window around
the diagonal — ~600M compares total instead of the dense (K, M) form.
Values are split into 8-bit digits of the *value* (so every digit
prefix-sum lives in [0, 255] and is bf16/f32-exact no matter how the
deltas cancel); the digits are recombined to int32 inside the kernel by
a second small matmul, and the output is written stream-major so the
XLA-side reads are contiguous rows.

Contract:
- ``starts`` sorted; strictly increasing while < EXCLUDED (1 << 30);
  entries >= EXCLUDED are ignored (use for culled suffixes).
- stream values are non-negative ints < 2**24.
- out[j] for j before the first start reads 0 (same as segment_fill).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 128  # output slots per group (window bound = strict monotonicity)
WIN = 2 * SUB  # window entries per group (<=128 starts + <=127 alignment)
SUBS_PER_STEP = 32  # groups fused per grid step (amortize DMA + overhead)
C_STEP = SUB * SUBS_PER_STEP  # output slots per grid step
W_STEP = C_STEP + WIN  # input window per grid step
EXCLUDED = jnp.int32(1 << 30)  # start sentinel: entry never contributes
NUM_DIGITS = 3  # 8-bit digits per stream (values < 2**24)


def _fill_kernel(
    lo_ref, carry_ref, starts_ref, digits_ref, out_ref, sbuf, dbuf, sems,
    *, n_steps: int, n_rows: int, n_streams: int,
):
    """Grid steps carry no sequential SCRATCH state: the running digit
    prefix entering each step is not accumulated across steps but read
    from ``carry_ref`` — it equals digits(values[g(t*C_STEP)]),
    precomputed on the XLA side with one searchsorted + tiny gather.
    (The r3 kernel serialized ~900 steps through a carry scratch; the
    sequential grid was the fill's actual cost at Garden scale, not the
    matmuls or DMA.)  Execution still MUST stay in-order — the
    cross-step double-buffered DMA (step t waits the copy started at
    step t-1) deadlocks under ``parallel`` dimension_semantics; see the
    compiler_params comment at the pallas_call."""
    t = pl.program_id(0)

    def base_of(step):
        return pl.multiple_of((lo_ref[step] // 128) * 128, 128)

    def dmas(slot, step):
        base = base_of(step)
        return (
            pltpu.make_async_copy(
                starts_ref.at[:, pl.ds(base, W_STEP)],
                sbuf.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                digits_ref.at[:, pl.ds(base, W_STEP)],
                dbuf.at[slot],
                sems.at[slot, 1],
            ),
        )

    @pl.when(t == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    slot = jax.lax.rem(t, 2)

    @pl.when(t + 1 < n_steps)
    def _():
        for d in dmas(1 - slot, t + 1):
            d.start()

    for d in dmas(slot, t):
        d.wait()
    carry = carry_ref[0]  # (n_rows, 1) digit prefix entering this step

    s_full = sbuf[slot]  # (1, W_STEP) int32, window-relative order

    # digit recombination matrix: stream s reads digit rows d*S + s
    # (digits are bf16-exact in [0, 255]; 256^d are exact powers of two)
    rr = jax.lax.broadcasted_iota(jnp.int32, (n_streams, n_rows), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (n_streams, n_rows), 1)
    weight = jnp.where(
        cc % n_streams == rr,
        jnp.exp2(8.0 * (cc // n_streams).astype(jnp.float32)),
        0.0,
    )
    rmat = jnp.where(cc // n_streams < NUM_DIGITS, weight, 0.0).astype(
        jnp.bfloat16
    )

    for b in range(SUBS_PER_STEP):
        g = t * SUBS_PER_STEP + b
        bound = g * SUB
        # window-relative index of this group's first entry
        lo_rel = jnp.sum((s_full < bound).astype(jnp.int32))
        off = pl.multiple_of((lo_rel // 128) * 128, 128)
        s_win = sbuf[slot, :, pl.ds(off, WIN)]  # (1, WIN) int32
        d_win = dbuf[slot, :, pl.ds(off, WIN)]  # (n_rows, WIN) bf16

        jpos = bound + jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0)
        # entries with start < bound are already in carry; entries with
        # start > jpos (incl. later groups / EXCLUDED) contribute later
        le = ((s_win >= bound) & (s_win <= jpos)).astype(jnp.bfloat16)

        mm = jax.lax.dot_general(
            d_win,
            le,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_rows, SUB) digit prefix sums
        res = mm + carry
        carry = res[:, SUB - 1 : SUB]
        combined = jax.lax.dot_general(
            rmat,
            res.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_streams, SUB)
        out_ref[:, b * SUB : (b + 1) * SUB] = combined


@functools.partial(
    jax.jit, static_argnames=("k", "n_rows", "n_streams", "interpret")
)
def _fill_call(
    starts_pad, digits_pad, lo, carry_in, k, n_rows, n_streams,
    interpret=False,
):
    n_steps = k // C_STEP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, n_rows, 1), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (n_streams, C_STEP), lambda t, *_: (0, t),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, W_STEP), jnp.int32),
            pltpu.VMEM((2, n_rows, W_STEP), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _fill_kernel,
            n_steps=n_steps,
            n_rows=n_rows,
            n_streams=n_streams,
        ),
        out_shape=jax.ShapeDtypeStruct((n_streams, k), jnp.float32),
        grid_spec=grid_spec,
        # NOT "parallel": the cross-step double-buffer (step t waits the
        # DMA started at step t-1) requires in-order grid execution
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(lo, carry_in, starts_pad, digits_pad)


def monotone_fill(
    starts: jax.Array,
    values: list[jax.Array],
    k: int,
    interpret: bool = False,
) -> list[jax.Array]:
    """out_s[j] = values_s[g(j)], g(j) = index of last start <= j.

    starts (M,) int32 sorted, strictly increasing below EXCLUDED;
    values: int32 arrays (M,), each 0 <= v < 2**24.  Returns int32
    (k,) arrays.  k must be a multiple of C_STEP.
    """
    if k % C_STEP:
        raise ValueError(f"k must be a multiple of {C_STEP}")
    m = starts.shape[0]
    m_pad = -(-(m + W_STEP) // 128) * 128
    n_streams = len(values)

    # 8-bit digits of the *values* (prefix sums stay in [0, 255]),
    # then telescoping deltas along m — all vectorized over streams
    v = jnp.stack(values)  # (S, m) int32
    digs = jnp.stack(
        [v & 255, (v >> 8) & 255, (v >> 16) & 255]
    )  # (3, S, m)
    prev = jnp.concatenate(
        [jnp.zeros((NUM_DIGITS, n_streams, 1), jnp.int32),
         digs[:, :, :-1]],
        axis=2,
    )
    rows = (digs - prev).astype(jnp.bfloat16).reshape(
        NUM_DIGITS * n_streams, m
    )  # row r = d * S + s
    n_rows = -(-rows.shape[0] // 8) * 8
    digits_pad = jnp.zeros((n_rows, m_pad), jnp.bfloat16)
    digits_pad = jax.lax.dynamic_update_slice(
        digits_pad, rows, (0, 0)
    )
    starts_pad = jnp.concatenate(
        [starts, jnp.full((m_pad - m,), EXCLUDED, jnp.int32)]
    )[None, :]

    bounds = jnp.arange(k // C_STEP + 1, dtype=jnp.int32) * C_STEP
    lo = jnp.searchsorted(starts, bounds, side="left").astype(jnp.int32)

    # per-step carry = digits of the value at the last start < bound
    # (grid steps are independent: no sequential carry in the kernel)
    g_in = lo[: k // C_STEP] - 1  # (n_steps,)
    dig_abs = digs.reshape(NUM_DIGITS * n_streams, m)  # row r = d*S + s
    carry_rows = jnp.where(
        g_in[None, :] >= 0,
        jnp.take(dig_abs, jnp.maximum(g_in, 0), axis=1),
        0,
    ).astype(jnp.float32)  # (rows, n_steps)
    carry_in = jnp.zeros(
        (k // C_STEP, n_rows, 1), jnp.float32
    ).at[:, : dig_abs.shape[0], 0].set(carry_rows.T)

    out = _fill_call(
        starts_pad, digits_pad, lo, carry_in, k, n_rows, n_streams,
        interpret=interpret,
    )  # (n_streams, k) f32
    return [out[s].astype(jnp.int32) for s in range(n_streams)]
