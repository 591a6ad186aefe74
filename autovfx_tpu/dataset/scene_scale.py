"""Scene metric-scale estimation.

Parity target: ``dataset_utils/estimate_scene_scale.py:17-125`` —
segment known objects in the anchor frame (RAM+GroundedSAM there;
precomputed masks here), ray-cast the masks onto the scene mesh for the
observed extent, ask GPT-4V (or the offline size table) for the real
size, and take the median of per-object scale ratios.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from autovfx_tpu.core.cameras import Camera
from autovfx_tpu.edit.mesh_io import Mesh
from autovfx_tpu.ops.raymesh import ray_mesh_first_hit
from autovfx_tpu.perception.gpt4v import estimate_object_scale


def observed_object_extent(
    cam: Camera, mask: np.ndarray, mesh: Mesh, stride: int = 4
) -> float:
    """World-space extent of a masked object via ray casting."""
    ys, xs = np.nonzero(mask[::stride, ::stride])
    if len(ys) < 4:
        return 0.0
    ys, xs = ys * stride, xs * stride
    rays = np.asarray(cam.ray_directions())[ys, xs]
    rays = rays / np.maximum(np.linalg.norm(rays, axis=1, keepdims=True),
                             1e-12)
    o = np.tile(np.asarray(cam.center), (len(rays), 1)).astype(np.float32)
    t, idx, hit = ray_mesh_first_hit(
        jnp.asarray(o),
        jnp.asarray(rays.astype(np.float32)),
        jnp.asarray(mesh.vertices[mesh.faces[:, 0]]),
        jnp.asarray(mesh.vertices[mesh.faces[:, 1]]),
        jnp.asarray(mesh.vertices[mesh.faces[:, 2]]),
    )
    h = np.asarray(hit)
    if h.sum() < 4:
        return 0.0
    pts = o[h] + rays[h] * np.asarray(t)[h, None]
    lo, hi = pts.min(0), pts.max(0)
    return float(np.linalg.norm(hi - lo))


def estimate_scene_scale(
    cam: Camera,
    mesh: Mesh,
    object_masks: Dict[str, np.ndarray],
) -> float:
    """Median of (observed extent / real-world size) over detected objects.

    The returned value is the reference's ``scene_scale`` (world units
    per meter, README.md:326 — Garden: 2.67).
    """
    ratios: List[float] = []
    for name, mask in object_masks.items():
        extent = observed_object_extent(cam, mask, mesh)
        if extent <= 0:
            continue
        real = estimate_object_scale(None, name)
        if real > 0:
            ratios.append(extent / real)
    if not ratios:
        return 1.0
    return float(np.median(ratios))
