"""Init-point strategies for 3DGS training.

Parity: the reference's scene loader supports ``init_strategy`` in
{colmap, ray_mesh, hybrid} (scene/dataset_readers.py:176-289): ray_mesh
casts rays through random training-view pixels onto the reconstructed
scene mesh (BakedSDF export) and seeds Gaussians at the hit points with
the pixel's color; hybrid concatenates COLMAP SfM points with an equal
count of ray-mesh points (total = 2x COLMAP).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.core.cameras import Camera, index_camera, num_cameras
from autovfx_tpu.ops.raymesh import ray_mesh_first_hit


def ray_mesh_init_points(
    cams: Camera,
    images: np.ndarray,  # (V, H, W, 3) float in [0,1]
    vertices: np.ndarray,
    faces: np.ndarray,
    num_points: int,
    seed: int = 0,
    rays_per_batch: int = 65_536,
) -> tuple[np.ndarray, np.ndarray]:
    """(xyz (N,3), rgb (N,3)) from training-view rays hitting the mesh.

    Pixels are drawn uniformly across views; rays that miss the mesh are
    dropped (the reference oversamples ~1.3x and truncates — we loop
    until filled or ray budget exhausted).
    """
    v = jnp.asarray(np.asarray(vertices, np.float32))
    f = np.asarray(faces, np.int64)
    ta, tb, tc = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    n_views = num_cameras(cams)
    h, w = images.shape[1:3]
    rng = np.random.RandomState(seed)

    @jax.jit
    def cast(view_idx, px, py):
        cam = index_camera(cams, view_idx)
        # pixel -> camera ray (CUDA pixel convention: center at +0.5)
        x = (px.astype(jnp.float32) + 0.5 - cam.cx) / cam.fx
        y = (py.astype(jnp.float32) + 0.5 - cam.cy) / cam.fy
        d_cam = jnp.stack([x, y, jnp.ones_like(x)], -1)
        from autovfx_tpu.utils.linalg import apply_rotation_t

        d_world = apply_rotation_t(d_cam, cam.R)  # c2w rotation
        d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
        origins = jnp.broadcast_to(cam.center, d_world.shape)
        t, _, hit = ray_mesh_first_hit(origins, d_world, ta, tb, tc)
        return origins + t[:, None] * d_world, hit

    pts_out, rgb_out = [], []
    got = 0
    for _ in range(8):  # ray budget: 8 batches max
        if got >= num_points:
            break
        vi = rng.randint(0, n_views)
        px = rng.randint(0, w, size=rays_per_batch)
        py = rng.randint(0, h, size=rays_per_batch)
        pts, hit = cast(
            jnp.int32(vi), jnp.asarray(px, jnp.int32),
            jnp.asarray(py, jnp.int32)
        )
        hit = np.asarray(hit)
        pts = np.asarray(pts)[hit]
        cols = np.asarray(images[vi])[py[hit], px[hit]]
        pts_out.append(pts)
        rgb_out.append(cols)
        got += len(pts)

    if not got:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32))
    xyz = np.concatenate(pts_out)[:num_points]
    rgb = np.concatenate(rgb_out)[:num_points]
    return xyz.astype(np.float32), rgb.astype(np.float32)


def build_init_points(
    strategy: str,
    colmap_xyz: np.ndarray,
    colmap_rgb: np.ndarray,
    cams: Camera | None = None,
    images: np.ndarray | None = None,
    mesh_vertices: np.ndarray | None = None,
    mesh_faces: np.ndarray | None = None,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Dispatch on init_strategy (dataset_readers.py:176-289 parity)."""
    if strategy == "colmap":
        return (
            np.asarray(colmap_xyz, np.float32),
            np.asarray(colmap_rgb, np.float32),
        )
    if strategy not in ("ray_mesh", "hybrid"):
        raise ValueError(f"unknown init_strategy {strategy!r}")
    if mesh_vertices is None or mesh_faces is None:
        raise ValueError(f"init_strategy={strategy} requires a scene mesh")
    n = len(colmap_xyz)
    rm_xyz, rm_rgb = ray_mesh_init_points(
        cams, np.asarray(images), mesh_vertices, mesh_faces, n, seed=seed
    )
    if strategy == "ray_mesh":
        return rm_xyz, rm_rgb
    return (
        np.concatenate([np.asarray(colmap_xyz, np.float32), rm_xyz]),
        np.concatenate([np.asarray(colmap_rgb, np.float32), rm_rgb]),
    )
