"""Monocular normal maps for the trainer's normal regularizer.

Parity target: ``dataset_utils/get_mono_normal.py:9-69`` — DSINE /
Metric3D inference producing per-view ``<name>_normal.png`` files, with
the reference's encoding: INWARD normals mapped ``(n + 1) / 2`` to RGB.

The predictor networks need torch-hub downloads (no egress here), so
the wrapper consumes their precomputed outputs when present — the same
contract as the DEVA/LaMa wrappers — and offers a native geometric
fallback that derives normal maps from rendered depth
(``train/losses.depth_to_normal``'s cross-product construction over
backprojected points), which keeps the 3DGS normal loss usable without
any external model.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from autovfx_tpu.core.cameras import Camera, index_camera


class PrecomputedNormalsMissing(RuntimeError):
    pass


def normal_map_path(output_dir: str, image_name: str) -> str:
    stem = os.path.splitext(image_name)[0]
    return os.path.join(output_dir, stem + "_normal.png")


def load_normal_map(path: str) -> np.ndarray:
    """Decode a reference-encoded normal PNG back to unit vectors in
    [-1, 1] (inward convention, get_mono_normal.py:17-19)."""
    from PIL import Image

    rgb = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    n = rgb * 2.0 - 1.0
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)


def save_normal_map(path: str, normals: np.ndarray) -> None:
    """Encode unit normals with the reference's (n+1)/2 mapping."""
    from PIL import Image

    img = np.clip((normals + 1.0) * 0.5 * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(img).save(path)


def normals_from_depth(depth: np.ndarray, cam: Camera) -> np.ndarray:
    """(H, W, 3) camera-frame inward normals from a view-z depth map
    (the geometric construction of losses.depth_to_normal applied to
    backprojected camera-frame points)."""
    h, w = depth.shape
    j, i = np.meshgrid(
        np.arange(h, dtype=np.float32) + 0.5,
        np.arange(w, dtype=np.float32) + 0.5,
        indexing="ij",
    )
    x = (i - float(cam.cx)) / float(cam.fx) * depth
    y = (j - float(cam.cy)) / float(cam.fy) * depth
    pts = np.stack([x, y, depth], axis=-1)
    dx = np.zeros_like(pts)
    dy = np.zeros_like(pts)
    dx[:, 1:-1] = pts[:, 2:] - pts[:, :-2]
    dy[1:-1, :] = pts[2:, :] - pts[:-2, :]
    n = np.cross(dy, dx)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    # inward convention: toward the camera means negative z in cam frame
    flip = n[..., 2:3] > 0
    return np.where(flip, -n, n)


def get_mono_normals(
    image_names: List[str],
    output_dir: str,
    depths: Optional[np.ndarray] = None,
    cams: Optional[Camera] = None,
) -> np.ndarray:
    """(F, H, W, 3) per-view normal maps.

    Priority per view: precomputed ``<name>_normal.png`` (DSINE /
    Metric3D run offline, get_mono_normal.py contract) → geometric
    normals from ``depths[i]`` → error naming the missing inputs.
    """
    out, missing = [], []
    for i, name in enumerate(image_names):
        p = normal_map_path(output_dir, name)
        if os.path.exists(p):
            out.append(load_normal_map(p))
        elif depths is not None and cams is not None:
            out.append(
                normals_from_depth(
                    np.asarray(depths[i]), index_camera(cams, i)
                )
            )
        else:
            missing.append(p)
    if missing:
        raise PrecomputedNormalsMissing(
            "no precomputed normal maps (run DSINE/Metric3D offline, "
            "get_mono_normal.py) and no depth fallback for: "
            + ", ".join(missing[:5])
        )
    return np.stack(out)
