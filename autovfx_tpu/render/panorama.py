"""Panorama rendering: 6-view cubemap -> equirectangular.

Parity target: ``sugar/gaussian_splatting/render_panorama.py:77-138`` —
render a cubemap from a center point and resample into an equirect
panorama (used for indoor-scene emitter maps).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.core import cameras as C
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize

# cubemap face orientations: (forward, up) in world, OpenCV convention
_FACES = [
    ([1, 0, 0], [0, 0, 1]),
    ([-1, 0, 0], [0, 0, 1]),
    ([0, 1, 0], [0, 0, 1]),
    ([0, -1, 0], [0, 0, 1]),
    ([0, 0, 1], [0, 1, 0]),
    ([0, 0, -1], [0, 1, 0]),
]


def render_panorama(
    g: Gaussians,
    center: np.ndarray,
    face_size: int = 512,
    out_height: int = 512,
    config: RasterConfig = RasterConfig(),
):
    """(H, 2H, 3) equirect panorama rendered from ``center``."""
    center = np.asarray(center, np.float64)
    fx = face_size / 2.0  # 90° FoV
    faces = []
    face_mats = []
    for fwd, up in _FACES:
        cam = C.look_at_camera(
            center, center + np.asarray(fwd, np.float64), up,
            fx=fx, fy=fx, width=face_size, height=face_size,
        )
        out = rasterize(g, cam, config=config)
        faces.append(np.asarray(out.color))
        face_mats.append(np.asarray(cam.R))

    # equirect resample: direction per pixel -> face + uv
    h = out_height
    w = 2 * h
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    uu, vv = np.meshgrid(u, v)
    theta = vv * np.pi
    phi = (uu - 0.5) * 2 * np.pi
    st = np.sin(theta)
    dirs = np.stack(
        [-st * np.cos(phi), -st * np.sin(phi), np.cos(theta)], axis=-1
    )  # matches render/envmap.py convention

    pano = np.zeros((h, w, 3), np.float32)
    best = np.full((h, w), -np.inf)
    for img, rm in zip(faces, face_mats):
        d_cam = dirs @ rm.T  # world -> camera
        z = d_cam[..., 2]
        px = fx * d_cam[..., 0] / np.maximum(z, 1e-9) + face_size / 2
        py = fx * d_cam[..., 1] / np.maximum(z, 1e-9) + face_size / 2
        ok = (
            (z > 0)
            & (px >= 0) & (px < face_size - 1)
            & (py >= 0) & (py < face_size - 1)
            & (z > best)
        )
        xi = np.clip(px.astype(int), 0, face_size - 1)
        yi = np.clip(py.astype(int), 0, face_size - 1)
        pano[ok] = img[yi[ok], xi[ok]]
        best = np.where(ok, z, best)
    return pano
