#!/usr/bin/env python
"""BASELINE config 2 evidence: 3DGS training from scratch on synthetic
multi-view ground truth, at the Garden operating point.

Renders GT images of a committed deterministic garden-like scene, then
trains a FRESH (point-initialized) model against them for --iters
iterations (reference cadence: 7k of train_3dgs.sh's 15k), reporting
iters/sec wall-clock and final train-view PSNR.  One JSON line, same
contract as bench.py.

    python scripts/train_at_scale.py --splats 300000 --iters 7000 \
        --width 1296 --height 840 --views 24

Small-footprint smoke run (CPU): --splats 2000 --iters 50 --width 64
--height 48 --views 4.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=300_000)
    ap.add_argument("--iters", type=int, default=7_000)
    ap.add_argument("--width", type=int, default=1296)
    ap.add_argument("--height", type=int, default=840)
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--force-cpu", action="store_true")
    args = ap.parse_args()
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from autovfx_tpu.core import cameras as C
    from autovfx_tpu.core.gaussians import Gaussians
    from autovfx_tpu.core.sh import C0
    from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
    from autovfx_tpu.train import trainer as T
    from autovfx_tpu.utils.synthetic import make_garden_like

    gt_model = make_garden_like(args.splats, extent=2.67)
    cams = C.stack_cameras(
        [
            C.look_at_camera(
                [3.2 * np.cos(a), 3.2 * np.sin(a), 1.2 + 0.4 * np.sin(3 * a)],
                [0, 0, 0.2], [0, 0, 1],
                fx=0.74 * args.width, fy=0.74 * args.width,
                width=args.width, height=args.height,
            )
            for a in np.linspace(0, 2 * np.pi, args.views, endpoint=False)
        ]
    )
    cfg_r = RasterConfig(
        dup_budget=1 << (21 if args.splats > 100_000 else 15),
        backend="pallas" if jax.default_backend() == "tpu" else "ref",
        feature_pack="f32",
    )

    # ground truth renders of the synthetic scene
    render_one = jax.jit(lambda cam: rasterize(gt_model, cam, config=cfg_r))
    gt = np.stack(
        [
            np.asarray(render_one(C.index_camera(cams, i)).color)
            for i in range(args.views)
        ]
    )

    # fresh model from noisy GT points (the COLMAP-points init analog)
    rng = np.random.RandomState(0)
    act = np.asarray(gt_model.active)
    pts = np.asarray(gt_model.xyz)[act]
    pts = pts + 0.02 * rng.randn(*pts.shape).astype(np.float32)
    cols = np.clip(
        (np.asarray(gt_model.sh_dc)[act] * C0 + 0.5)
        + 0.1 * rng.randn(len(pts), 3).astype(np.float32),
        0.0, 1.0,
    )
    g0 = Gaussians.create(
        jnp.asarray(pts), jnp.asarray(cols)
    ).pad_to(int(len(pts) * 1.5))

    cfg_t = T.TrainConfig(
        raster=cfg_r, iterations=args.iters,
        densify_until_iter=min(args.iters // 2, 15_000),
    )
    t0 = time.time()
    state, hist = T.train(
        g0, cams, jnp.asarray(gt), cfg_t, log_every=max(args.iters // 10, 1)
    )
    jax.block_until_ready(state.gaussians.xyz)
    wall = time.time() - t0

    # final train-view PSNR over all views
    final = state.gaussians
    rf = jax.jit(lambda cam: rasterize(final, cam, config=cfg_r))
    psnrs = []
    for i in range(args.views):
        img = np.asarray(rf(C.index_camera(cams, i)).color)
        mse = float(np.mean((img - gt[i]) ** 2))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
    print(
        json.dumps(
            {
                "metric": (
                    f"3DGS from-scratch training {args.width}x{args.height}"
                    f" ({args.splats} GT splats, {args.views} views,"
                    f" {args.iters} iters)"
                ),
                "value": round(args.iters / wall, 2),
                "unit": "iters/s",
                "wall_seconds": round(wall, 1),
                "final_psnr": round(float(np.mean(psnrs)), 2),
                "active_splats": int(final.num_active),
                "history": hist[-3:],
            }
        )
    )


if __name__ == "__main__":
    main()
