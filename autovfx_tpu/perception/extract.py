"""Object extraction from the scene: masks → triangle votes → meshes+splats.

Parity target: ``extract/extract_object.py``:
- extract_object_from_scene (:55-392): per-frame DEVA masks → rays
  through mask pixels → first-hit triangles on the scene mesh →
  per-triangle view-vote counters → sweep vote-ratio thresholds, pick
  by min XOR between the selected Gaussians' rendered alpha and the mask
  → export object_mesh.obj / removal_mesh.obj / object_gaussians.ply /
  removal_gaussians.ply.
- get_largest_object (:629-646): instance with the most mask pixels.
- inpaint_object (:448-626): planar hull patch at the object's z-min,
  removal-region renders + masks, LaMa inpaint per view.

TPU-native: ray casting via ops.raymesh (chunked Möller–Trumbore),
Gaussian↔triangle association via nearest-surfel distance, alpha renders
through the Pallas/ref rasterizer.
"""
from __future__ import annotations

import os
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.core import cameras as C
from autovfx_tpu.core import ply_io
from autovfx_tpu.edit import mesh_io
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
from autovfx_tpu.ops.raymesh import ray_mesh_first_hit
from autovfx_tpu.perception.wrappers import (
    inpaint_img_with_lama,
    load_instance_masks,
)

VOTE_THRESHOLDS = np.linspace(0.05, 0.95, 22)  # sweep (:168-231 analog)
RAY_STRIDE = 4  # subsample mask pixels for ray casting


def get_largest_object(scene_representation, object_name, obj_ids) -> int:
    """Max total mask pixels across frames (extract_object.py:629-646)."""
    tracking_dir = os.path.join(
        scene_representation.tracking_results_dir,
        "_".join(object_name.split(" ")),
    )
    best, best_id = -1, obj_ids[0]
    for oid in obj_ids:
        masks = load_instance_masks(tracking_dir, oid)
        tot = int(masks.sum())
        if tot > best:
            best, best_id = tot, oid
    return best_id


def _mask_rays(cam: C.Camera, mask: np.ndarray, stride: int):
    ys, xs = np.nonzero(mask[::stride, ::stride])
    ys = ys * stride
    xs = xs * stride
    rays = np.asarray(cam.ray_directions())
    d = rays[ys, xs]
    d = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    o = np.tile(np.asarray(cam.center), (len(d), 1))
    return o.astype(np.float32), d.astype(np.float32)


def extract_object_from_scene(
    scene_representation, object_name: str, obj_id: int
) -> str:
    """Segment the scene mesh + Gaussians into object/remainder.

    Returns the object mesh path; writes the four artifacts next to it
    (layout matches extract_object.py:263-284)."""
    sr = scene_representation
    base = os.path.join(
        sr.cache_dir, "extract", "_".join(object_name.split(" ")), str(obj_id)
    )
    obj_mesh_path = os.path.join(base, "object_mesh", "object_mesh.obj")
    if os.path.exists(obj_mesh_path):
        return obj_mesh_path
    os.makedirs(os.path.dirname(obj_mesh_path), exist_ok=True)
    os.makedirs(os.path.join(base, "removal_mesh"), exist_ok=True)

    scene_mesh = mesh_io.load_mesh(sr.scene_mesh_path_for_blender)
    tri_a = jnp.asarray(scene_mesh.vertices[scene_mesh.faces[:, 0]])
    tri_b = jnp.asarray(scene_mesh.vertices[scene_mesh.faces[:, 1]])
    tri_c = jnp.asarray(scene_mesh.vertices[scene_mesh.faces[:, 2]])
    n_faces = len(scene_mesh.faces)

    tracking_dir = os.path.join(
        sr.tracking_results_dir, "_".join(object_name.split(" "))
    )
    masks = load_instance_masks(tracking_dir, obj_id)  # (F, H, W)

    votes = np.zeros(n_faces, np.int64)
    seen = np.zeros(n_faces, np.int64)
    n_frames = min(len(masks), sr.total_frames)
    for fi in range(n_frames):
        cam = C.index_camera(sr.cameras, fi)
        mask = masks[fi]
        if mask.shape != (cam.height, cam.width):
            from PIL import Image

            mask = np.asarray(
                Image.fromarray(mask.astype(np.uint8) * 255).resize(
                    (cam.width, cam.height)
                )
            ) > 127
        # rays through mask pixels vote FOR their hit triangle
        o, d = _mask_rays(cam, mask, RAY_STRIDE)
        if len(o):
            _, idx, hit = ray_mesh_first_hit(
                jnp.asarray(o), jnp.asarray(d), tri_a, tri_b, tri_c
            )
            idx = np.asarray(idx)[np.asarray(hit)]
            np.add.at(votes, idx, 1)
        # rays through non-mask pixels mark triangles as seen-but-out
        o2, d2 = _mask_rays(cam, ~mask, RAY_STRIDE * 2)
        if len(o2):
            _, idx2, hit2 = ray_mesh_first_hit(
                jnp.asarray(o2), jnp.asarray(d2), tri_a, tri_b, tri_c
            )
            idx2 = np.asarray(idx2)[np.asarray(hit2)]
            np.add.at(seen, idx2, 1)

    ratio = votes / np.maximum(votes + seen, 1)

    # --- threshold sweep: pick selection minimizing alpha-vs-mask XOR -------
    # Evaluated across MULTIPLE tracked views (extract_object.py:168-231
    # sums the rendered-alpha-vs-mask XOR over the track), so one bad
    # anchor mask cannot corrupt the selection.
    anchor = sr.hparams.anchor_frame_idx
    n_sweep = int(getattr(sr.hparams, "n_sweep_frames", 8))
    cand = np.unique(
        np.concatenate([
            [min(anchor, len(masks) - 1)],
            np.linspace(0, len(masks) - 1, n_sweep).astype(int),
        ])
    )
    # keep only frames where the instance is actually visible
    sweep_frames = [f for f in cand if masks[f].sum() > 0] or [
        int(cand[0])
    ]
    gaussian_tri = _closest_triangle(
        np.asarray(sr.gaussians.xyz), scene_mesh
    )
    cfg = RasterConfig(dup_budget=sr.hparams.dup_budget, backend="ref"
                       if jax.default_backend() != "tpu" else "pallas")

    def _resize_to(mask, shape):
        if mask.shape == shape:
            return mask
        from PIL import Image

        return np.asarray(
            Image.fromarray(mask.astype(np.uint8) * 255).resize(
                (shape[1], shape[0])
            )
        ) > 127

    render_alpha = jax.jit(
        lambda act, cam: rasterize(
            sr.gaussians.replace(active=act), cam, config=cfg
        ).alpha
    )
    best = (1e18, None)
    for thr in VOTE_THRESHOLDS:
        tri_sel = ratio >= thr
        if tri_sel.sum() == 0:
            continue
        g_sel = jnp.asarray(tri_sel[gaussian_tri]) & sr.gaussians.active
        xor_sum = 0.0
        for f in sweep_frames:
            camf = C.index_camera(sr.cameras, f)
            alpha = np.asarray(render_alpha(g_sel, camf)) > 0.5
            mf = _resize_to(masks[f], alpha.shape)
            xor_sum += np.logical_xor(alpha, mf).mean()
        xor = xor_sum / len(sweep_frames)
        if xor < best[0]:
            best = (xor, thr)
    thr = best[1] if best[1] is not None else 0.5
    tri_sel = ratio >= thr
    g_sel = tri_sel[gaussian_tri] & np.asarray(sr.gaussians.active)

    # --- exports (object + removal) ------------------------------------------
    _export_submesh(
        scene_mesh, tri_sel, os.path.join(base, "object_mesh",
                                          "object_mesh.obj")
    )
    _export_submesh(
        scene_mesh, ~tri_sel, os.path.join(base, "removal_mesh",
                                           "removal_mesh.obj")
    )
    g = sr.gaussians
    ply_io.save_ply(
        os.path.join(base, "object_gaussians.ply"),
        g.replace(active=jnp.asarray(g_sel)),
    )
    ply_io.save_ply(
        os.path.join(base, "removal_gaussians.ply"),
        g.replace(active=jnp.asarray(~g_sel) & g.active),
    )
    return obj_mesh_path


def _closest_triangle(points: np.ndarray, mesh: mesh_io.Mesh) -> np.ndarray:
    """(N,) nearest-triangle index per point (o3d RaycastingScene
    compute_closest_points analog, extract_object.py:106-110): true
    point-to-triangle distances through the uniform mesh grid (centroid
    KD queries mis-assign points near large triangles)."""
    from autovfx_tpu.physics.shapes import (
        build_mesh_grid,
        mesh_closest_triangle,
    )

    grid = build_mesh_grid(mesh.vertices, mesh.faces, resolution=32)
    idx = mesh_closest_triangle(grid, jnp.asarray(points, jnp.float32))
    return np.asarray(idx, np.int64)


def _export_submesh(mesh: mesh_io.Mesh, tri_mask: np.ndarray, path: str):
    faces = mesh.faces[tri_mask]
    used = np.unique(faces)
    remap = np.full(len(mesh.vertices), -1, np.int64)
    remap[used] = np.arange(len(used))
    sub = mesh_io.Mesh(
        vertices=mesh.vertices[used],
        faces=remap[faces],
        vertex_colors=(
            mesh.vertex_colors[used]
            if mesh.vertex_colors is not None
            else None
        ),
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mesh_io.save_obj(path, sub)


def extract_object_from_single_view(scene_representation, object_name, mask):
    """Anchor-view-only variant (extract_object.py:395-445)."""
    sr = scene_representation
    cam = C.index_camera(sr.cameras, sr.hparams.anchor_frame_idx)
    scene_mesh = mesh_io.load_mesh(sr.scene_mesh_path_for_blender)
    o, d = _mask_rays(cam, mask, RAY_STRIDE)
    t, idx, hit = ray_mesh_first_hit(
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.asarray(scene_mesh.vertices[scene_mesh.faces[:, 0]]),
        jnp.asarray(scene_mesh.vertices[scene_mesh.faces[:, 1]]),
        jnp.asarray(scene_mesh.vertices[scene_mesh.faces[:, 2]]),
    )
    pts = o[np.asarray(hit)] + d[np.asarray(hit)] * np.asarray(t)[
        np.asarray(hit), None
    ]
    return pts


def inpaint_object(scene_representation, object_name: str, obj_id):
    """Close the removal hole and prepare inpainted training views
    (extract_object.py:448-626): planar convex-hull patch at the object's
    z-min + per-view removal renders/masks + LaMa inpaints."""
    sr = scene_representation
    base = os.path.join(
        sr.cache_dir, "extract", "_".join(object_name.split(" ")),
        str(obj_id),
    )
    removal = mesh_io.load_mesh(
        os.path.join(base, "removal_mesh", "removal_mesh.obj")
    )
    obj_mesh = mesh_io.load_mesh(
        os.path.join(base, "object_mesh", "object_mesh.obj")
    )

    # planar patch: convex hull of the object footprint at its z-min
    from scipy.spatial import ConvexHull

    z_min = float(obj_mesh.vertices[:, 2].min())
    xy = obj_mesh.vertices[:, :2]
    hull = ConvexHull(xy)
    ring = xy[hull.vertices]
    center = ring.mean(axis=0)
    patch_v = np.concatenate(
        [np.array([[center[0], center[1], z_min]]),
         np.column_stack([ring, np.full(len(ring), z_min)])]
    ).astype(np.float32)
    n = len(ring)
    patch_f = np.array(
        [[0, 1 + i, 1 + (i + 1) % n] for i in range(n)], np.int64
    )

    merged = mesh_io.Mesh(
        vertices=np.concatenate([removal.vertices, patch_v]),
        faces=np.concatenate(
            [removal.faces, patch_f + len(removal.vertices)]
        ),
        vertex_colors=None,
    )
    out_dir = os.path.join(base, "inpaint_removal_mesh")
    os.makedirs(out_dir, exist_ok=True)
    mesh_io.save_obj(
        os.path.join(out_dir, "inpaint_removal_mesh.obj"), merged
    )

    # removal-gaussian renders + hole masks + LaMa inpaints per view
    lama_dir = os.path.join(base, "render_inpaint_lama")
    mask_dir = os.path.join(base, "render_inpaint_mask")
    os.makedirs(lama_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    g_removal = ply_io.load_gaussians(
        os.path.join(base, "removal_gaussians.ply")
    )
    cfg = RasterConfig(
        dup_budget=sr.hparams.dup_budget,
        backend="pallas" if jax.default_backend() == "tpu" else "ref",
    )
    from PIL import Image

    cam_poses = []
    n_views = min(sr.total_frames, 24)
    for fi in range(n_views):
        cam = C.index_camera(sr.cameras, fi)
        out = rasterize(g_removal, cam, config=cfg)
        rgb = np.clip(np.asarray(out.color), 0, 1)
        hole = np.asarray(out.alpha) < 0.3
        inpainted = inpaint_img_with_lama(
            rgb,
            hole,
            cache_path=os.path.join(lama_dir, f"{fi:05d}.png"),
        )
        Image.fromarray(
            inpainted if inpainted.dtype == np.uint8
            else (inpainted * 255).astype(np.uint8)
        ).save(os.path.join(lama_dir, f"{fi:05d}.png"))
        Image.fromarray((hole * 255).astype(np.uint8)).save(
            os.path.join(mask_dir, f"{fi:05d}.png")
        )
        cam_poses.append(np.asarray(cam.c2w).tolist())

    import json

    cam0 = C.index_camera(sr.cameras, 0)
    with open(os.path.join(base, "inpaint_camera_poses.json"), "w") as f:
        json.dump(
            {
                "fl_x": float(cam0.fx),
                "fl_y": float(cam0.fy),
                "cx": float(cam0.cx),
                "cy": float(cam0.cy),
                "w": int(sr.cameras.width),
                "h": int(sr.cameras.height),
                "frames": [
                    {
                        "filename": f"{i:05d}.png",
                        "transform_matrix": m,
                    }
                    for i, m in enumerate(cam_poses)
                ],
            },
            f,
        )
    return base
