"""Per-stage timing of the edited-frame fast path at the Garden
operating point (1296x840, 1M splats) on the real chip.

Times each stage as the difference of two device-side scan lengths
(cancels dispatch+fetch overhead), with paced dispatches (axon cadence
workaround).  Prints one line per stage.

Usage:  python scripts/tpu_stage_profile.py [N_GAUSS]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

PACE = float(os.environ.get("BENCH_DISPATCH_PACE", "0.5"))
W, H = 1296, 840
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
TILE = 32
CHUNK = 128


def timed(name, build_run, n_short=2, n_long=8):
    run_s, run_l = build_run(n_short), build_run(n_long)
    time.sleep(PACE); float(run_s())
    time.sleep(PACE); float(run_l())
    time.sleep(PACE); float(run_s())
    time.sleep(PACE)
    t0 = time.time(); float(run_s()); t_s = time.time() - t0
    time.sleep(PACE)
    t0 = time.time(); float(run_l()); t_l = time.time() - t0
    ms = max(t_l - t_s, 1e-9) / (n_long - n_short) * 1e3
    print(f"{name:42s} {ms:8.2f} ms", flush=True)
    return ms


def scan_of(fn, *args):
    """Each step re-derives its inputs through an optimization_barrier
    keyed on the loop index — otherwise XLA hoists loop-invariant stage
    bodies out of the scan and the diff-timer measures ~0."""

    def build_run(n):
        @jax.jit
        def run():
            def step(c, i):
                barred = jax.lax.optimization_barrier((i, *args))
                return c + fn(barred[0], *barred[1:]), None

            acc, _ = jax.lax.scan(step, 0.0, jnp.arange(n, dtype=jnp.int32))
            return acc

        return run

    return build_run


def main():
    from autovfx_tpu.core import cameras as C
    from autovfx_tpu.ops import binning, preprocess_pallas as PP, projection
    from autovfx_tpu.ops import blend_pallas, blend_ref
    from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
    from autovfx_tpu.utils.synthetic import make_garden_like

    print(f"devices: {jax.devices()}  N={N}", flush=True)
    g = make_garden_like(N, extent=2.67)
    cams = C.stack_cameras([
        C.look_at_camera(
            [2.6 * np.cos(a), 2.6 * np.sin(a), 1.4], [0, 0, 0.2],
            [0, 0, 1], fx=960.98, fy=963.15, width=W, height=H,
        )
        for a in np.linspace(0, 2 * np.pi, 8, endpoint=False)
    ])
    cfg = RasterConfig(dup_budget=1 << 21, backend="pallas", tile=TILE,
                       chunk=CHUNK, feature_pack="bf16")

    @jax.jit
    def padded_count(g, i):
        cam = C.index_camera(cams, i)
        s = projection.preprocess(g, cam, tile=cfg.tile)
        tx = (W + TILE - 1) // TILE
        ty = (H + TILE - 1) // TILE
        return jnp.sum(s.tiles_touched) + tx * ty * cfg.chunk

    worst = 0
    for i in range(8):
        time.sleep(PACE)
        worst = max(worst, int(padded_count(g, i)))
    cfg = cfg.replace(dup_budget=binning.round_budget(worst, slack=1.06))
    print(f"dup budget {cfg.dup_budget}", flush=True)

    rows = jax.jit(PP.pack_scene_rows)(g)
    cam0 = C.index_camera(cams, 0)
    n_pad = rows.shape[1] * 128

    # stage 1: fused preprocess+pack
    def pre(i, rows):
        ps = PP.preprocess_packed(rows, n_pad, C.index_camera(cams, i % 8),
                                  tile=TILE)
        return ps.feat[0].sum() + ps.splats.depth.sum()

    timed("fused preprocess+pack", scan_of(pre, rows))

    ps0 = jax.jit(lambda rows: PP.preprocess_packed(
        rows, n_pad, cam0, tile=TILE))(rows)
    splats, feat = ps0.splats, ps0.feat

    # stage 2: binning (presort + fill + counts + final sort)
    def binf(i, splats):
        b = binning.bin_splats(splats, W, H, cfg.dup_budget, tile=TILE,
                               chunk=CHUNK)
        return (b.gid % 7).sum().astype(jnp.float32) + i * 0.0

    timed("bin_splats (sorts+fill+counts)", scan_of(binf, splats))

    b0 = jax.jit(lambda s: binning.bin_splats(
        s, W, H, cfg.dup_budget, tile=TILE, chunk=CHUNK))(splats)

    # stage 3: duplicate feature gather
    def gath(i, feat, gid):
        fd = feat[:, gid]
        return fd[0].sum() + i * 0.0

    timed("feature gather (8 x K)", scan_of(gath, feat, b0.gid))

    fd0 = jax.jit(lambda f, gid: f[:, gid])(feat, b0.gid)
    tx, ty = int(b0.num_tiles_x), int(b0.num_tiles_y)

    # stage 4: blend kernel (each algo)
    for algo in ("fast", "linear", "log"):
        def bl(i, fd, start, chunks, _algo=algo):
            out = blend_pallas._blend_fwd_call(
                fd, start, chunks, tx * ty, tx, TILE, CHUNK, algo=_algo)
            return out[:, 0, :].sum() + i * 0.0

        timed(f"blend fwd ({algo})",
              scan_of(bl, fd0, b0.tile_start, b0.tile_chunks))

    out0 = jax.jit(
        lambda fd, s, c: blend_pallas._blend_fwd_call(
            fd, s, c, tx * ty, tx, TILE, CHUNK)
    )(fd0, b0.tile_start, b0.tile_chunks)

    # stage 5: assemble rows
    def asm(i, out):
        r = blend_ref.assemble_rows(out, tx, ty, W, H, tile=TILE)
        return r[0].sum() + i * 0.0

    timed("assemble rows", scan_of(asm, out0))

    # end-to-end single camera + ring
    def e2e(i, g, rows):
        out = rasterize(g, C.index_camera(cams, 0), config=cfg,
                        packed_rows=rows)
        return out.color.mean() + i * 0.0

    timed("end-to-end novel view (cam0)", scan_of(e2e, g, rows))

    def e2e_ring(i, g, rows):
        out = rasterize(g, C.index_camera(cams, i % 8), config=cfg,
                        packed_rows=rows)
        return out.color.mean()

    timed("end-to-end novel view (ring)", scan_of(e2e_ring, g, rows))


if __name__ == "__main__":
    main()
