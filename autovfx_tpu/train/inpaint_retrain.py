"""3DGS retraining on inpainted views after object removal.

Parity target: ``scene_representation.training_3DGS_for_inpainting``
(:450-543): 2000 iterations on LaMa-inpainted renders with masked L1
(+ LPIPS in the reference — here masked L1+DSSIM), densify every 300
iterations with min_opacity 0.1, then save inpaint_gaussians.ply.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.core import cameras as C
from autovfx_tpu.core import ply_io
from autovfx_tpu.ops.rasterize import RasterConfig
from autovfx_tpu.train import trainer as T


def training_3DGS_for_inpainting(
    scene_representation,
    removal_gaussians_path: str,
    inpainted_dir: str,
    mask_dir: str,
    out_dir: str,
    camera_poses_json: str,
    iterations: int = 2000,
):
    from PIL import Image

    g = ply_io.load_gaussians(removal_gaussians_path)
    cap = int(1.5 * g.capacity)
    g = g.pad_to(max(cap, g.capacity + 1024))

    cams, _, names = C.load_custom_trajectory(camera_poses_json)
    imgs = []
    for name in names:
        img = np.asarray(
            Image.open(os.path.join(inpainted_dir, name)).convert("RGB"),
            np.float32,
        ) / 255.0
        imgs.append(img)
    imgs = jnp.asarray(np.stack(imgs))

    backend = "pallas" if jax.default_backend() == "tpu" else "ref"
    cfg = T.TrainConfig(
        iterations=iterations,
        raster=RasterConfig(
            dup_budget=scene_representation.hparams.dup_budget,
            backend=backend,
        ),
        densification_interval=300,
        min_opacity=0.1,
        densify_from_iter=300,
        densify_until_iter=iterations,
        opacity_reset_interval=10**9,
        spatial_lr_scale=scene_representation.scene_scale,
    )
    state, _ = T.train(g, cams, imgs, cfg)
    out_path = os.path.join(out_dir, "inpaint_gaussians.ply")
    ply_io.save_ply(out_path, state.gaussians)
    return out_path
