"""Video/IO helpers (frames -> mp4, trajectory render driver).

Parity target: ``blend_all.generate_video_from_frames`` (:31-53, fps 15)
and ``sugar/gaussian_splatting/render.py:33-51`` (trajectory renders
with depth/normal dumps).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def write_video(frames: np.ndarray, path: str, fps: int = 15) -> None:
    """(F, H, W, 3) float [0,1] or uint8 -> mp4 (imageio/ffmpeg)."""
    import imageio.v2 as imageio

    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        writer = imageio.get_writer(path, fps=fps)
        for fr in frames:
            writer.append_data(fr)
        writer.close()
    except Exception:
        # no ffmpeg: fall back to a frame directory next to the target
        d = path + ".frames"
        os.makedirs(d, exist_ok=True)
        from PIL import Image

        for i, fr in enumerate(frames):
            Image.fromarray(fr).save(os.path.join(d, f"{i:04d}.png"))


def render_trajectory(
    gaussians,
    cams,
    out_dir: str,
    config=None,
    save_depth: bool = True,
    save_normal: bool = False,
    video_path: Optional[str] = None,
    fps: int = 15,
):
    """Render every camera; save PNGs (+depth .npy) and optionally a video
    (render.py:33-51 layout: images/, depth/)."""
    import jax

    from autovfx_tpu.core import cameras as C
    from autovfx_tpu.ops.rasterize import RasterConfig, render

    config = config or RasterConfig()
    img_dir = os.path.join(out_dir, "images")
    depth_dir = os.path.join(out_dir, "depth")
    os.makedirs(img_dir, exist_ok=True)
    if save_depth:
        os.makedirs(depth_dir, exist_ok=True)

    from PIL import Image

    render_one = jax.jit(
        lambda g, cam: render(g, cam, config=config, with_normal=save_normal)
    )
    frames = []
    for i in range(C.num_cameras(cams)):
        cam = C.index_camera(cams, i)
        out = render_one(gaussians, cam)
        rgb = np.clip(np.asarray(out.rgba[..., :3]), 0, 1)
        frames.append(rgb)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"{i:05d}.png")
        )
        if save_depth:
            np.save(
                os.path.join(depth_dir, f"{i:05d}.npy"),
                np.asarray(out.depth),
            )
        if save_normal:
            n01 = (np.asarray(out.normal) * 0.5 + 0.5).clip(0, 1)
            Image.fromarray((n01 * 255).astype(np.uint8)).save(
                os.path.join(img_dir, f"normal_{i:05d}.png")
            )
    frames = np.stack(frames)
    if video_path:
        write_video(frames, video_path, fps=fps)
    return frames
