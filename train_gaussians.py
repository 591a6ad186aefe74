"""Full scene-reconstruction pipeline CLI.

Parity target: ``train_3dgs.sh`` + ``sugar/train.py:113-190``:
  1. vanilla 3DGS training (hybrid init: COLMAP points [+ ray-mesh]),
  2. coarse SuGaR training with SDF/density regularization,
  3. surface mesh extraction (level 0.3),
  4. mesh-bound refinement + textured mesh export.

Usage:
  python train_gaussians.py --source_path <colmap scene> \\
      --model_path output/scene [--iterations 7000] [--skip_refine]
"""
import argparse
import os

import numpy as np


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--source_path", required=True,
                   help="COLMAP scene dir (sparse/0 + images/)")
    p.add_argument("--model_path", required=True)
    p.add_argument("--iterations", type=int, default=15_000)
    p.add_argument("--coarse_iterations", type=int, default=7_000)
    p.add_argument("--regularize_from", type=int, default=2_000)
    p.add_argument("--downscale", type=float, default=4.0)
    p.add_argument("--capacity", type=int, default=2_000_000)
    p.add_argument("--dup_budget", type=int, default=1 << 22)
    p.add_argument("--surface_level", type=float, default=0.3)
    p.add_argument("--mesh_resolution", type=int, default=192)
    p.add_argument("--target_vertices", type=int, default=1_000_000)
    p.add_argument("--gaussians_per_triangle", type=int, default=1)
    p.add_argument("--init_strategy", default="colmap",
                   choices=["colmap", "ray_mesh", "hybrid"],
                   help="seed-point strategy (dataset_readers.py:176-289);"
                        " ray_mesh/hybrid need --init_mesh")
    p.add_argument("--init_mesh", default=None,
                   help="scene mesh (e.g. BakedSDF export) for ray_mesh/"
                        "hybrid init")
    p.add_argument("--skip_refine", action="store_true")
    p.add_argument("--eval", action="store_true",
                   help="hold out every 8th view for metrics")
    return p.parse_args()


def load_scene(args):
    import jax.numpy as jnp
    from PIL import Image

    from autovfx_tpu.dataset.colmap import colmap_to_cameras, load_colmap_scene

    sparse = os.path.join(args.source_path, "sparse", "0")
    cams, names = colmap_to_cameras(sparse, downscale=args.downscale)
    _, _, (xyz, rgb) = load_colmap_scene(sparse)
    img_dir = os.path.join(args.source_path, "images")
    images = []
    from autovfx_tpu.core import cameras as C

    for i, name in enumerate(names):
        img = Image.open(os.path.join(img_dir, name)).convert("RGB")
        cam = C.index_camera(cams, i)
        img = img.resize((cam.width, cam.height))
        images.append(np.asarray(img, np.float32) / 255.0)
    return cams, jnp.asarray(np.stack(images)), xyz, rgb


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache")
    )
    import jax.numpy as jnp

    from autovfx_tpu.core import ply_io
    from autovfx_tpu.edit import mesh_io
    from autovfx_tpu.ops.rasterize import RasterConfig
    from autovfx_tpu.sugar.coarse_train import SugarConfig, coarse_train
    from autovfx_tpu.sugar.extract_mesh import extract_mesh_from_gaussians
    from autovfx_tpu.sugar.refine import bake_texture, bind_to_mesh, realize
    from autovfx_tpu.train.checkpoint import save_snapshot
    from autovfx_tpu.train.trainer import (
        TrainConfig,
        init_gaussians_from_points,
        train,
    )
    from autovfx_tpu.utils import metrics as MET

    args = get_args()
    if args.init_strategy != "colmap" and not args.init_mesh:
        raise SystemExit(
            f"--init_strategy {args.init_strategy} requires --init_mesh"
        )
    os.makedirs(args.model_path, exist_ok=True)
    cams, images, xyz, rgb = load_scene(args)
    print(f"loaded {images.shape[0]} views, {len(xyz)} SfM points")

    raster = RasterConfig(dup_budget=args.dup_budget)
    extent = float(np.abs(np.asarray(cams.center)).max()) * 1.1

    # ---- stage 1: vanilla 3DGS ------------------------------------------------
    if args.init_strategy != "colmap":
        from autovfx_tpu.train.init_points import build_init_points

        mesh = mesh_io.load_mesh(args.init_mesh)
        xyz, rgb = build_init_points(
            args.init_strategy, xyz, rgb, cams=cams, images=images,
            mesh_vertices=mesh.vertices, mesh_faces=mesh.faces,
        )
        print(f"init_strategy={args.init_strategy}: {len(xyz)} seed points")
    g0 = init_gaussians_from_points(
        jnp.asarray(xyz), jnp.asarray(rgb)
    ).pad_to(args.capacity)
    cfg = TrainConfig(
        iterations=args.iterations,
        raster=raster,
        spatial_lr_scale=extent,
        densify_until_iter=args.iterations // 2,
    )
    from autovfx_tpu.train.trainer import init_state

    state, hist = train(g0, cams, images, cfg, log_every=500)
    for h in hist:
        print(h)
    save_snapshot(args.model_path, state, args.iterations)

    # ---- stage 2: coarse SuGaR -------------------------------------------------
    scfg = SugarConfig(
        base=TrainConfig(
            iterations=args.coarse_iterations,
            raster=raster,
            spatial_lr_scale=extent,
            densify_until_iter=args.regularize_from,
        ),
        regularize_from=args.regularize_from,
    )
    state2, hist2 = coarse_train(
        state.gaussians, cams, images, scfg, log_every=500
    )
    coarse_ply = os.path.join(args.model_path, "sugarcoarse.ply")
    ply_io.save_ply(coarse_ply, state2.gaussians)
    print(f"coarse SuGaR -> {coarse_ply}")

    # ---- stage 3: mesh extraction ----------------------------------------------
    mesh_path = os.path.join(args.model_path, "mesh.obj")
    mesh = extract_mesh_from_gaussians(
        state2.gaussians,
        cams,
        out_path=mesh_path,
        config=raster,
        level=args.surface_level,
        fg_resolution=args.mesh_resolution,
        target_vertices=args.target_vertices,
    )
    print(f"mesh: {len(mesh.vertices)} verts, {len(mesh.faces)} faces "
          f"-> {mesh_path}")

    # ---- stage 4: refinement + texture -------------------------------------------
    if not args.skip_refine:
        bg = bind_to_mesh(
            mesh, n_per_triangle=args.gaussians_per_triangle
        )
        refined = realize(bg)
        refined_ply = os.path.join(args.model_path, "sugarfine.ply")
        ply_io.save_ply(refined_ply, refined)
        tex, uv = bake_texture(bg)
        from PIL import Image

        Image.fromarray(
            (np.clip(tex, 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(args.model_path, "texture.png"))
        print(f"refined splats -> {refined_ply} (+texture.png)")

    # ---- metrics -----------------------------------------------------------------
    res = MET.evaluate(
        state2.gaussians, cams, np.asarray(images), config=raster,
        out_json=os.path.join(args.model_path, "metrics.json"),
    )
    print("eval:", res["psnr"], "dB PSNR,", res["ssim"], "SSIM")


if __name__ == "__main__":
    main()
