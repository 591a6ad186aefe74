"""SuGaR surface mesh extraction (coarse mesh).

Parity target: ``sugar_extractors/coarse_mesh.py:13-767``:
per-camera level-set point clouds (:252-296) → fg/bg split by the
camera-extent bbox (:345-380) → outlier removal (:393-397) → surface
reconstruction (:398-409; Poisson there, density-grid marching
tetrahedra here — see sugar/marching.py) → decimation (:441-458) →
cleanup → merged mesh write (:496).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.core.cameras import Camera, index_camera, num_cameras
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.edit import mesh_io
from autovfx_tpu.ops.knn import knn_indices
from autovfx_tpu.ops.rasterize import RasterConfig
from autovfx_tpu.sugar import density as D
from autovfx_tpu.sugar.levelset import level_surface_from_camera
from autovfx_tpu.sugar.marching import (
    decimate_vertex_clustering,
    marching_tetrahedra,
)


def extract_level_points(
    g: Gaussians,
    cams: Camera,
    config: RasterConfig = RasterConfig(),
    every_nth: int = 3,
    level: float = 0.3,
    pixel_stride: int = 2,
):
    """Union of per-camera level-set samples (every 3rd training camera,
    coarse_mesh.py:252-296)."""
    pts, nrm = [], []
    for i in range(0, num_cameras(cams), every_nth):
        cam = index_camera(cams, i)
        ls = level_surface_from_camera(
            g, cam, config=config, level=level, pixel_stride=pixel_stride
        )
        m = np.asarray(ls.valid)
        pts.append(np.asarray(ls.points)[m])
        nrm.append(np.asarray(ls.normals)[m])
    return np.concatenate(pts), np.concatenate(nrm)


def remove_outliers(points: np.ndarray, normals: np.ndarray,
                    k: int = 16, std_ratio: float = 2.0):
    """Statistical outlier removal (o3d remove_statistical_outlier analog,
    coarse_mesh.py:393-397)."""
    idx, d2 = knn_indices(jnp.asarray(points), k=k)
    mean_d = np.asarray(jnp.sqrt(jnp.maximum(d2, 0.0)).mean(axis=1))
    mu, sd = mean_d.mean(), mean_d.std()
    keep = mean_d < mu + std_ratio * sd
    return points[keep], normals[keep]


def density_grid_mesh(
    g: Gaussians,
    bbox_min: np.ndarray,
    bbox_max: np.ndarray,
    resolution: int = 192,
    level: float = 0.3,
    k: int = 16,
    chunk: int = 1 << 18,
):
    """Evaluate the density field on a grid and run marching tetrahedra
    (coarse_mesh.py:725-764 marching-cubes alternative)."""
    bbox_min = np.asarray(bbox_min, np.float32)
    bbox_max = np.asarray(bbox_max, np.float32)
    extent = bbox_max - bbox_min
    spacing = extent / (resolution - 1)
    xs = np.linspace(bbox_min[0], bbox_max[0], resolution)
    ys = np.linspace(bbox_min[1], bbox_max[1], resolution)
    zs = np.linspace(bbox_min[2], bbox_max[2], resolution)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)

    from autovfx_tpu.sugar.levelset import _nearest_gaussian

    dens = np.empty(len(pts), np.float32)
    g_neighbors = D.reset_neighbors(g, k=k)
    eval_fn = jax.jit(
        lambda p, nb: D.compute_density(p, nb, g, chunk=min(chunk, 1 << 18))
    )
    for s in range(0, len(pts), chunk):
        pc = jnp.asarray(pts[s : s + chunk])
        pad = (-pc.shape[0]) % chunk
        if pad:
            pc = jnp.concatenate([pc, jnp.zeros((pad, 3))], 0)
        nearest, _ = _nearest_gaussian(pc, g)
        d = eval_fn(pc, g_neighbors[nearest])
        dens[s : s + chunk] = np.asarray(d)[: len(pts[s : s + chunk])]
    grid = dens.reshape(resolution, resolution, resolution)
    verts, faces = marching_tetrahedra(grid, level, bbox_min, spacing)
    return verts, faces


def extract_mesh_from_gaussians(
    g: Gaussians,
    cams: Camera,
    out_path: Optional[str] = None,
    config: RasterConfig = RasterConfig(),
    level: float = 0.3,
    fg_resolution: int = 192,
    bg_resolution: int = 96,
    target_vertices: int = 1_000_000,
    bbox_expand: float = 1.05,
    method: str = "poisson",
    density_prune_quantile: float = 0.1,
) -> mesh_io.Mesh:
    """Full coarse-mesh extraction (extract_mesh.py driver parity).

    fg/bg split by the camera-extent bbox (coarse_mesh.py:345-380):
    the foreground box spans the camera centers (expanded), meshed at
    high resolution; the background at low resolution; merged.

    ``method`` for the foreground surface:
      - "poisson": screened-Poisson indicator solve on the level-set
        cloud (sugar/poisson.py — the reference's own algorithm,
        spectral/TPU-native; best fidelity),
      - "tsdf": truncated SDF fusion of level-set depth maps
        (sugar/sdf_fusion.py),
      - "density_grid": direct SuGaR density isosurface.
    Decimation is quadric edge-collapse (sugar/decimate.py;
    coarse_mesh.py:441-458 o3d analog) + the density-quantile prune.
    """
    centers = np.asarray(cams.center)
    c_min, c_max = centers.min(0), centers.max(0)
    c_ext = np.maximum(c_max - c_min, 0.5)
    mid = (c_min + c_max) / 2
    fg_min = mid - bbox_expand * c_ext
    fg_max = mid + bbox_expand * c_ext

    if method == "poisson":
        from autovfx_tpu.sugar.poisson import poisson_mesh_from_gaussians

        v_fg, f_fg = poisson_mesh_from_gaussians(
            g, cams, config=config, resolution=fg_resolution,
            level=level,
        )
    elif method == "tsdf":
        from autovfx_tpu.sugar.sdf_fusion import tsdf_mesh

        v_fg, f_fg = tsdf_mesh(
            g, cams, fg_min, fg_max, config=config,
            resolution=fg_resolution,
        )
    else:
        v_fg, f_fg = density_grid_mesh(
            g, fg_min, fg_max, resolution=fg_resolution, level=level
        )
    # background: everything within 3x the fg box (density field — the
    # cameras rarely observe it well enough for depth fusion)
    bg_min = mid - 3 * bbox_expand * c_ext
    bg_max = mid + 3 * bbox_expand * c_ext
    v_bg, f_bg = density_grid_mesh(
        g, bg_min, bg_max, resolution=bg_resolution, level=level
    )
    # drop bg faces inside the fg box (avoid double surface)
    if len(f_bg):
        fc = v_bg[f_bg].mean(1)
        outside = ~(
            (fc > fg_min[None]).all(1) & (fc < fg_max[None]).all(1)
        )
        f_bg = f_bg[outside]

    verts = np.concatenate([v_fg, v_bg]) if len(v_bg) else v_fg
    faces = (
        np.concatenate([f_fg, f_bg + len(v_fg)]) if len(f_bg) else f_fg
    )
    from autovfx_tpu.sugar.decimate import (
        decimate_quadric,
        density_quantile_prune,
    )

    verts, faces = decimate_quadric(verts, faces, target_vertices)
    if density_prune_quantile and len(verts):
        # support density = inverse distance to the nearest splat (the
        # Poisson-density prune analog: drop verts far from evidence)
        from autovfx_tpu.sugar.levelset import _nearest_gaussian

        nearest, _ = _nearest_gaussian(jnp.asarray(verts), g)
        d2 = np.sum(
            (verts - np.asarray(g.xyz)[np.asarray(nearest)]) ** 2, axis=1
        )
        dens = 1.0 / (1.0 + d2)
        verts, faces = density_quantile_prune(
            verts, faces, dens, density_prune_quantile
        )

    # vertex colors from the gaussian field (nearest gaussian's color)
    from autovfx_tpu.sugar.levelset import _nearest_gaussian
    from autovfx_tpu.core.sh import sh_to_rgb

    if len(verts):
        nearest, _ = _nearest_gaussian(jnp.asarray(verts), g)
        base = np.asarray(
            sh_to_rgb(0, g.sh[:, :1], jnp.zeros((g.capacity, 3)))
        )
        colors = np.clip(base[np.asarray(nearest)], 0, 1)
    else:
        colors = None

    mesh = mesh_io.Mesh(
        vertices=verts.astype(np.float32),
        faces=faces.astype(np.int64),
        vertex_colors=colors,
    )
    if out_path:
        if out_path.endswith(".obj"):
            mesh_io.save_obj(out_path, mesh)
        else:
            mesh_io.save_ply_mesh(out_path, mesh)
    return mesh
