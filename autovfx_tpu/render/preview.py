"""Asset preview rendering (replaces blender/asset_rendering.py:265-293).

Renders N turntable views of an asset through the surfel pipeline under
a neutral envmap — used by retrieve_asset for GPT-4V scale/axis
estimation (edit_utils.py:226-231 contract: <out>/<object_id>/NNN.png).
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from autovfx_tpu.core import cameras as C
from autovfx_tpu.edit import mesh_io
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
from autovfx_tpu.render import ibl, meshsplat


def render_asset_previews(
    object_path: str,
    output_dir: str,
    object_id: str,
    num_views: int = 4,
    size: int = 256,
) -> str:
    out_dir = os.path.join(output_dir, object_id)
    if os.path.isdir(out_dir) and len(os.listdir(out_dir)) >= num_views:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    mesh = mesh_io.load_mesh(object_path).normalized_to_unit_box()
    surf = meshsplat.sample_mesh_surfels(
        mesh.vertices,
        mesh.faces,
        num_samples=40_000,
        vertex_colors=mesh.vertex_colors,
        uv=mesh.uv,
        texture=mesh.texture,
    )
    env_np = np.full((32, 64, 3), 1.0, np.float32)
    env = jnp.asarray(env_np)
    env_sh = jnp.asarray(ibl.envmap_sh9(env_np))
    cfg = RasterConfig(dup_budget=1 << 18, backend="auto")

    from PIL import Image

    for i in range(num_views):
        a = 2 * np.pi * i / num_views
        cam = C.look_at_camera(
            [1.8 * np.cos(a), 1.8 * np.sin(a), 0.6],
            [0, 0, 0],
            [0, 0, 1],
            fx=1.2 * size,
            fy=1.2 * size,
            width=size,
            height=size,
        )
        g = meshsplat.shaded_object_gaussians(
            surf, env, env_sh, cam.center
        )
        out = rasterize(g, cam, bg=jnp.ones(3), config=cfg)
        img = np.clip(np.asarray(out.color), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{i:03d}.png")
        )
    return out_dir
