"""Benchmark: Garden-operating-point edited-frame rendering throughput.

Prints ONE JSON line {metric, value, unit, vs_baseline}.

Config matches BASELINE.md's headline target: novel-view rendering of a
Garden-scale splat scene (~1M active Gaussians) at 1296x840 through the
Pallas tile rasterizer on one TPU chip; ``vs_baseline`` is the ratio to
the 60 FPS/chip north-star (BASELINE.json).

Frames are timed with a device-side lax.scan over a ring of cameras so
host/tunnel dispatch latency is excluded (one dispatch, many frames).
"""
import json
import os
import time

os.environ.setdefault("BENCH_WIDTH", "1296")
os.environ.setdefault("BENCH_HEIGHT", "840")

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

WIDTH = int(os.environ["BENCH_WIDTH"])
HEIGHT = int(os.environ["BENCH_HEIGHT"])
N_GAUSS = int(os.environ.get("BENCH_GAUSSIANS", 1_000_000))
TILE = int(os.environ.get("BENCH_TILE", 32))
CHUNK = int(os.environ.get("BENCH_CHUNK", 256 if TILE == 16 else 128))
_default_budget = 6_291_456 if TILE == 16 else 2_097_152
DUP_BUDGET = int(os.environ.get("BENCH_DUP_BUDGET", _default_budget))
FRAMES = int(os.environ.get("BENCH_FRAMES", 8))
# BASELINE.md's headline metric is EDITED-frame throughput (config 4):
# full object + shadow + composite per frame.  BENCH_MODE=view measures
# the plain novel-view rasterizer.
MODE = os.environ.get("BENCH_MODE", "edit")  # edit | view
BASELINE_FPS = 60.0  # BASELINE.md: edited-frame rendering >= 60 FPS/chip


def _make_cams():
    from autovfx_tpu.core import cameras as C

    return C.stack_cameras(
        [
            C.look_at_camera(
                [2.6 * np.cos(a), 2.6 * np.sin(a), 1.4],
                [0.0, 0.0, 0.2],
                [0.0, 0.0, 1.0],
                fx=960.98 * WIDTH / 1296.0,
                fy=963.15 * WIDTH / 1296.0,
                width=WIDTH,
                height=HEIGHT,
            )
            for a in np.linspace(0, 2 * np.pi, FRAMES, endpoint=False)
        ]
    )


def main():
    from autovfx_tpu.core import cameras as C
    from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
    from autovfx_tpu.utils.synthetic import make_garden_like

    backend = "pallas" if jax.default_backend() == "tpu" else "ref"
    g = make_garden_like(N_GAUSS, extent=2.67)
    cams = _make_cams()
    cfg = RasterConfig(
        dup_budget=DUP_BUDGET, backend=backend, tile=TILE, chunk=CHUNK,
        feature_pack=os.environ.get("BENCH_FEATURE_PACK", "bf16"),
    )
    bg = jnp.zeros((3,), jnp.float32)

    if MODE == "edit":
        try:
            return _main_edit(g, cams, cfg)
        except Exception as e:  # noqa: BLE001 — degrade, don't die
            # an edit-path failure (e.g. cold-compile OOM on a busy
            # host) must not leave the driver without a benchmark line;
            # fall through to the clearly-labeled novel-view metric
            print(f"# edit-mode bench failed ({e}); falling back to view",
                  flush=True)

    # fused Pallas preprocess fast path: field-major scene rows built
    # once per scene (ops/preprocess_pallas.py)
    use_fused = backend == "pallas" and cfg.feature_pack == "bf16"
    if use_fused:
        from autovfx_tpu.ops import preprocess_pallas as PP

        rows = jax.jit(PP.pack_scene_rows)(g)
    else:
        rows = None

    @jax.jit
    def run(g, rows):
        def frame(carry, i):
            cam = C.index_camera(cams, i)
            out = rasterize(g, cam, bg=bg, config=cfg, packed_rows=rows)
            return (
                carry + out.color.mean(),
                out.overflow,
            )

        acc, ovf = jax.lax.scan(frame, 0.0, jnp.arange(FRAMES))
        return acc, ovf.any()

    # compile + warmup
    acc, overflow = jax.block_until_ready(run(g, rows))
    t0 = time.time()
    acc, overflow = jax.block_until_ready(run(g, rows))
    dt = time.time() - t0
    fps = FRAMES / dt

    print(
        json.dumps(
            {
                "metric": (
                    f"garden-like {WIDTH}x{HEIGHT} novel-view render FPS/chip "
                    f"({N_GAUSS} splats, {backend} backend, tile={TILE})"
                ),
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )
    if bool(overflow):
        raise SystemExit("duplicate budget overflow — benchmark invalid")


def _main_edit(g, cams, cfg):
    """BASELINE config 4: full edited frames (object + shadow + composite)
    through render/clip.py — one physics-animated cube over the scene."""
    from autovfx_tpu.physics.shapes import build_hulls
    from autovfx_tpu.render import clip as CL
    from autovfx_tpu.render import meshsplat as MS

    corners = np.array(
        [[x, y, z] for x in (-0.3, 0.3) for y in (-0.3, 0.3)
         for z in (-0.3, 0.3)], np.float32
    )
    faces = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
         [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
         [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64
    )
    hull, _, _, _ = build_hulls([corners])
    surf = MS.sample_mesh_surfels(corners, faces, num_samples=50_000)
    # a falling-then-resting trajectory (stand-in for a solver replay;
    # per-frame cost is identical either way)
    zs = np.maximum(1.5 - 0.5 * 9.8 * (np.arange(FRAMES) / 15.0) ** 2, 0.3)
    traj_pos = np.stack(
        [np.stack([np.zeros(FRAMES), np.zeros(FRAMES), zs], -1)], 1
    ).astype(np.float32)
    traj_rot = np.tile(np.eye(3, dtype=np.float32), (FRAMES, 1, 1, 1))
    rng = np.random.RandomState(0)
    env = (0.4 + 0.6 * rng.rand(32, 64, 3)).astype(np.float32)

    fused = cfg.backend == "pallas" and cfg.feature_pack == "bf16"
    if os.environ.get("BENCH_EDIT_FUSED") == "0":
        fused = False
    inp = CL.build_clip_inputs(
        bg=g, cams=cams,
        objects=[{"scale": 1.0, "material": {"rgb": [0.8, 0.2, 0.2]}}],
        surfels=[surf], traj_pos=traj_pos, traj_rot=traj_rot,
        hull_shape=hull, env=env, num_lights=16, pack_rows=fused,
    )
    frame_fn = (
        CL.render_edited_frame_fused if fused else CL.render_edited_frame
    )

    @jax.jit
    def run(inp):
        def frame(carry, i):
            f = frame_fn(inp, i, cfg)
            return carry + f.mean(), None

        acc, _ = jax.lax.scan(frame, 0.0, jnp.arange(FRAMES))
        return acc

    acc = jax.block_until_ready(run(inp))
    t0 = time.time()
    acc = jax.block_until_ready(run(inp))
    dt = time.time() - t0
    fps = FRAMES / dt
    print(
        json.dumps(
            {
                "metric": (
                    f"garden-like {WIDTH}x{HEIGHT} EDITED-frame FPS/chip "
                    f"({N_GAUSS} splats + object/shadow/composite, "
                    f"tile={TILE})"
                ),
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
