"""Per-stage TPU probe: run each rasterizer pipeline stage on the real
chip and compare against its CPU/XLA reference.  Pinpoints which kernel
aborts with INVALID_ARGUMENT (BENCH_r03 / round-4 matrix failures).

Each stage runs in THIS process; run the script once per suspicion level
or rely on stage ordering (earliest failure wins — later stages may be
poisoned by sticky device errors, so rerun with STAGES=<name> to
confirm).  Usage:

    STAGES=fill3,fill4,bin,blend_log python scripts/tpu_unit_probe.py
"""
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

WHICH = os.environ.get("STAGES", "").split(",") if os.environ.get("STAGES") else None
N = int(os.environ.get("PROBE_N", 50_000))
W = int(os.environ.get("PROBE_W", 256))
H = int(os.environ.get("PROBE_H", 256))
TILE = int(os.environ.get("PROBE_TILE", 32))
CHUNK = 256 if TILE == 16 else 128
BUDGET = 1 << 17


def stage(name):
    def deco(fn):
        if WHICH is not None and name not in WHICH:
            return fn
        print(f"--- {name} ...", flush=True)
        try:
            fn()
            print(f"OK  {name}", flush=True)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc(limit=3)
        return fn

    return deco


def make_scene():
    from autovfx_tpu.utils.synthetic import make_garden_like

    return make_garden_like(N, extent=2.67)


def make_cam():
    from autovfx_tpu.core import cameras as C

    return C.look_at_camera(
        [2.6, 0.0, 1.4], [0.0, 0.0, 0.2], [0.0, 0.0, 1.0],
        fx=200.0, fy=200.0, width=W, height=H,
    )


@stage("matmul")
def _matmul():
    x = jnp.ones((512, 512))
    np.testing.assert_allclose(float((x @ x).sum()), 512.0**3)


@stage("fill3")
def _fill3():
    from autovfx_tpu.ops import fill_pallas as FP

    rng = np.random.RandomState(0)
    m = 4096
    k = FP.C_STEP * 4
    # contract: strictly-increasing live starts, culled SUFFIX only
    n_live = 3000
    counts = np.concatenate(
        [rng.randint(1, 5, size=n_live), np.zeros(m - n_live, np.int64)]
    ).astype(np.int32)
    offs = np.cumsum(counts) - counts
    starts = np.where(counts > 0, offs, int(FP.EXCLUDED)).astype(np.int32)
    vals = [
        rng.randint(0, 1 << 24, size=m).astype(np.int32) for _ in range(3)
    ]
    out = FP.monotone_fill(
        jnp.asarray(starts), [jnp.asarray(v) for v in vals], k
    )
    out = [np.asarray(o) for o in out]
    # reference
    live = counts > 0
    s_live, v_live = offs[live], [v[live] for v in vals]
    g = np.searchsorted(s_live, np.arange(k), side="right") - 1
    for s in range(3):
        ref = np.where(g >= 0, v_live[s][np.clip(g, 0, None)], 0)
        np.testing.assert_array_equal(out[s], ref)


@stage("fill4")
def _fill4():
    from autovfx_tpu.ops import fill_pallas as FP

    rng = np.random.RandomState(1)
    m = 4096
    k = FP.C_STEP * 4
    n_live = 3000
    counts = np.concatenate(
        [rng.randint(1, 5, size=n_live), np.zeros(m - n_live, np.int64)]
    ).astype(np.int32)
    offs = np.cumsum(counts) - counts
    starts = np.where(counts > 0, offs, int(FP.EXCLUDED)).astype(np.int32)
    vals = [
        rng.randint(0, 1 << 24, size=m).astype(np.int32) for _ in range(4)
    ]
    out = FP.monotone_fill(
        jnp.asarray(starts), [jnp.asarray(v) for v in vals], k
    )
    out = [np.asarray(o) for o in out]
    live = counts > 0
    s_live, v_live = offs[live], [v[live] for v in vals]
    g = np.searchsorted(s_live, np.arange(k), side="right") - 1
    for s in range(4):
        ref = np.where(g >= 0, v_live[s][np.clip(g, 0, None)], 0)
        np.testing.assert_array_equal(out[s], ref)


def _bin(compact: str, fill_backend: str):
    from autovfx_tpu.ops import binning, projection

    os.environ["AUTOVFX_COMPACT_PRESORT"] = compact
    g = make_scene()
    cam = make_cam()
    s = jax.jit(
        lambda g: projection.preprocess(g, cam, tile=TILE)
    )(g)
    b = jax.jit(
        lambda s: binning.bin_splats(
            s, W, H, BUDGET, tile=TILE, chunk=CHUNK,
            fill_backend=fill_backend,
        )
    )(s)
    gid = np.asarray(b.gid)
    tile_arr = np.asarray(b.tile)
    assert np.isfinite(np.asarray(b.tile_count)).all()
    return s, b, gid, tile_arr


@stage("bin_xla_fill")
def _bin_xla():
    _bin("1", "xla")


@stage("bin_pallas_compact")
def _bin_pc():
    s, b, gid, tile_arr = _bin("1", "pallas")
    _, b2, gid2, tile2 = _bin("1", "xla")
    np.testing.assert_array_equal(gid, gid2)
    np.testing.assert_array_equal(tile_arr, tile2)


@stage("bin_pallas_nocompact")
def _bin_pn():
    s, b, gid, tile_arr = _bin("0", "pallas")
    _, b2, gid2, tile2 = _bin("0", "xla")
    np.testing.assert_array_equal(gid, gid2)
    np.testing.assert_array_equal(tile_arr, tile2)


def _blend(algo: str, pack: str):
    os.environ["AUTOVFX_BLEND_ALGO"] = algo
    from autovfx_tpu.core import cameras as C
    from autovfx_tpu.ops.rasterize import RasterConfig, rasterize

    g = make_scene()
    cam = make_cam()
    cfg = RasterConfig(
        dup_budget=BUDGET, backend="pallas", tile=TILE, chunk=CHUNK,
        feature_pack=pack,
    )
    out = jax.jit(
        lambda g: rasterize(g, cam, config=cfg)
    )(g)
    img = np.asarray(out.color)
    assert np.isfinite(img).all(), "NaN/inf in image"
    assert img.std() > 1e-4, "blank image"
    return img


@stage("raster_f32_log")
def _r1():
    _blend("log", "f32")


@stage("raster_bf16_fast")
def _r2():
    _blend("fast", "bf16")


@stage("raster_bf16_log")
def _r3():
    _blend("log", "bf16")


@stage("raster_bf16_linear")
def _r4():
    _blend("linear", "bf16")


@stage("raster_fused")
def _r5():
    os.environ["AUTOVFX_BLEND_ALGO"] = "fast"
    from autovfx_tpu.ops import preprocess_pallas as PP
    from autovfx_tpu.ops.rasterize import RasterConfig, rasterize

    g = make_scene()
    cam = make_cam()
    cfg = RasterConfig(
        dup_budget=BUDGET, backend="pallas", tile=TILE, chunk=CHUNK,
        feature_pack="bf16",
    )
    rows = jax.jit(PP.pack_scene_rows)(g)
    out = jax.jit(
        lambda g, rows: rasterize(g, cam, config=cfg, packed_rows=rows)
    )(g, rows)
    img = np.asarray(out.color)
    assert np.isfinite(img).all()
    assert img.std() > 1e-4


def _scan_raster(n_iters: int, pack: str):
    """rasterize inside lax.scan — the bench's timed-loop shape (the
    short scan passed / long scan failed signature in BENCH_r03)."""
    os.environ["AUTOVFX_BLEND_ALGO"] = "fast" if pack != "f32" else "log"
    from autovfx_tpu.ops.rasterize import RasterConfig, rasterize

    g = make_scene()
    cam = make_cam()
    cfg = RasterConfig(
        dup_budget=BUDGET, backend="pallas", tile=TILE, chunk=CHUNK,
        feature_pack=pack,
    )

    @jax.jit
    def run(g):
        def frame(carry, i):
            out = rasterize(g, cam, config=cfg)
            return carry + out.color.mean(), None

        acc, _ = jax.lax.scan(
            frame, 0.0, jnp.arange(n_iters, dtype=jnp.int32)
        )
        return acc

    v = float(run(g))
    assert np.isfinite(v)


@stage("repeat10_bf16")
def _rep10():
    """Same jitted rasterize executed 10x — distinguishes a per-
    execution resource leak from a scan-length effect."""
    os.environ["AUTOVFX_BLEND_ALGO"] = "fast"
    from autovfx_tpu.ops.rasterize import RasterConfig, rasterize

    g = make_scene()
    cam = make_cam()
    cfg = RasterConfig(
        dup_budget=BUDGET, backend="pallas", tile=TILE, chunk=CHUNK,
        feature_pack="bf16",
    )
    fn = jax.jit(lambda g: rasterize(g, cam, config=cfg).color.mean())
    for i in range(10):
        v = float(fn(g))
        assert np.isfinite(v), f"iter {i}"


@stage("repeat20_xla_only")
def _rep_xla():
    """20 rapid re-executions of a pallas-FREE computation (sort +
    gather + matmul, the binning-like XLA mix).  If this aborts, the
    cross-execution failure is an axon-plugin dispatch bug, not ours."""
    k = 1 << 20
    key = jax.random.PRNGKey(0)
    vals = jax.random.uniform(key, (k,))
    idx = jax.random.randint(jax.random.PRNGKey(1), (k,), 0, k)

    @jax.jit
    def fn(v, i):
        s, p = jax.lax.sort((v, i), num_keys=1)
        g = v[p]
        m = g[: 1 << 10].reshape(32, 32)
        return (m @ m.T).sum() + s.sum()

    for it in range(20):
        v = float(fn(vals, idx))
        assert np.isfinite(v), f"iter {it}"


@stage("repeat10_bf16_slow")
def _rep10_slow():
    """Same as repeat10_bf16 but with 0.5 s host sleeps between
    dispatches — discriminates a dispatch-cadence effect."""
    import time as _time

    os.environ["AUTOVFX_BLEND_ALGO"] = "fast"
    from autovfx_tpu.ops.rasterize import RasterConfig, rasterize

    g = make_scene()
    cam = make_cam()
    cfg = RasterConfig(
        dup_budget=BUDGET, backend="pallas", tile=TILE, chunk=CHUNK,
        feature_pack="bf16",
    )
    fn = jax.jit(lambda g: rasterize(g, cam, config=cfg).color.mean())
    for i in range(10):
        v = float(fn(g))
        _time.sleep(0.5)
        assert np.isfinite(v), f"iter {i}"


@stage("repeat10_fill_only")
def _rep_fill():
    """10 rapid re-executions of just bin_splats (pallas fill, no
    blend) — isolates the fill kernel's cross-execution behavior."""
    from autovfx_tpu.ops import binning, projection

    g = make_scene()
    cam = make_cam()
    s = jax.jit(lambda g: projection.preprocess(g, cam, tile=TILE))(g)

    @jax.jit
    def fn(s):
        b = binning.bin_splats(
            s, W, H, BUDGET, tile=TILE, chunk=CHUNK,
            fill_backend="pallas",
        )
        return b.gid.sum() + b.tile.sum()

    for i in range(10):
        v = float(fn(s))
        assert np.isfinite(v), f"iter {i}"


@stage("repeat10_blend_only")
def _rep_blend():
    """10 rapid re-executions of just the packed blend kernel on a
    FIXED binned input — isolates the blend kernel."""
    os.environ["AUTOVFX_BLEND_ALGO"] = "fast"
    from autovfx_tpu.ops import binning, blend_pallas, projection

    g = make_scene()
    cam = make_cam()
    s = jax.jit(lambda g: projection.preprocess(g, cam, tile=TILE))(g)
    b = jax.jit(
        lambda s: binning.bin_splats(
            s, W, H, BUDGET, tile=TILE, chunk=CHUNK,
            fill_backend="xla",
        )
    )(s)
    feat = jax.jit(blend_pallas.pack_gaussian_features_8)(s)
    feat_dup = jax.jit(lambda f, gid: f[:, gid])(feat, b.gid)
    tx, ty = b.num_tiles_x, b.num_tiles_y

    @jax.jit
    def fn(fd, start, chunks):
        out = blend_pallas._blend_fwd_call(
            fd, start, chunks, tx * ty, tx, TILE, CHUNK
        )
        return out.sum()

    for i in range(10):
        v = float(fn(feat_dup, b.tile_start, b.tile_chunks))
        assert np.isfinite(v), f"iter {i}"


@stage("repeat10_preproc_only")
def _rep_pre():
    """10 rapid re-executions of just the fused preprocess kernel."""
    from autovfx_tpu.ops import preprocess_pallas as PP

    g = make_scene()
    cam = make_cam()
    rows = jax.jit(PP.pack_scene_rows)(g)

    @jax.jit
    def fn(rows):
        ps = PP.preprocess_packed(rows, g.capacity, cam, tile=TILE)
        return ps.feat.sum() + ps.splats.depth.sum()

    for i in range(10):
        v = float(fn(rows))
        assert np.isfinite(v), f"iter {i}"


@stage("scan2_f32")
def _s2():
    _scan_raster(2, "f32")


@stage("scan8_f32")
def _s8():
    _scan_raster(8, "f32")


@stage("scan8_bf16")
def _s8b():
    _scan_raster(8, "bf16")


@stage("scan32_f32")
def _s32():
    _scan_raster(32, "f32")


@stage("train_step")
def _train():
    from autovfx_tpu.core import cameras as C
    from autovfx_tpu.ops.rasterize import RasterConfig
    from autovfx_tpu.train import trainer as T

    g = make_scene()
    cam = make_cam()
    cfg = RasterConfig(
        dup_budget=BUDGET, backend="pallas", tile=TILE, chunk=CHUNK,
        feature_pack="f32",
    )
    cfg_t = T.TrainConfig(raster=cfg)
    state = T.init_state(g)
    gt = jnp.zeros((H, W, 3), jnp.float32)
    s2, aux = jax.jit(
        lambda s: T.train_step(s, cam, gt, cfg_t)
    )(state)
    assert np.isfinite(float(aux.loss))


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    print("done", flush=True)
