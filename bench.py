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
_default_budget = 6_291_456 if TILE == 16 else 2_359_296
DUP_BUDGET = int(os.environ.get("BENCH_DUP_BUDGET", _default_budget))
FRAMES = int(os.environ.get("BENCH_FRAMES", 8))
BASELINE_FPS = 60.0


def main():
    from autovfx_tpu.core import cameras as C
    from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
    from autovfx_tpu.utils.synthetic import make_garden_like

    backend = "pallas" if jax.default_backend() == "tpu" else "ref"
    g = make_garden_like(N_GAUSS, extent=2.67)
    cams = C.stack_cameras(
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
    cfg = RasterConfig(
        dup_budget=DUP_BUDGET, backend=backend, tile=TILE, chunk=CHUNK
    )
    bg = jnp.zeros((3,), jnp.float32)

    @jax.jit
    def run(g):
        def frame(carry, i):
            cam = C.index_camera(cams, i)
            out = rasterize(g, cam, bg=bg, config=cfg)
            return (
                carry + out.color.mean(),
                out.overflow,
            )

        acc, ovf = jax.lax.scan(frame, 0.0, jnp.arange(FRAMES))
        return acc, ovf.any()

    # compile + warmup
    acc, overflow = jax.block_until_ready(run(g))
    t0 = time.time()
    acc, overflow = jax.block_until_ready(run(g))
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


if __name__ == "__main__":
    main()
