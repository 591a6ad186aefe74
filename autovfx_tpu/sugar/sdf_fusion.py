"""Volumetric SDF fusion of rendered depth maps (surface reconstruction).

Parity target: the screened-Poisson reconstruction step of
``sugar_extractors/coarse_mesh.py:398-409`` (o3d
``create_from_point_cloud_poisson`` depth 10 on the level-set cloud,
followed by density-quantile pruning :441-458).

TPU-first replacement: truncated signed-distance fusion (KinectFusion
style) of the rasterizer's expected-depth maps over the training
cameras — each camera contributes ``clamp((D(u,v) − z)/τ, −1, 1)`` at
every grid point it sees, weight-averaged across views.  For dense
multi-view depth this matches Poisson's watertight-surface quality and
is a pure ``lax.scan`` of vectorized projective math over a static
grid — no linear solve, no host round trips.  The zero crossing is
meshed by the existing marching-tetrahedra kernel.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.core.cameras import Camera, index_camera, num_cameras
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
from autovfx_tpu.sugar.marching import marching_tetrahedra


def _window_max(a: np.ndarray, r: int = 2) -> np.ndarray:
    """Per-frame (C, H, W) max filter over a (2r+1)² window."""
    out = a.copy()
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            out = np.maximum(
                out, np.roll(np.roll(a, dy, axis=1), dx, axis=2)
            )
    return out


def tsdf_fuse(
    cams: Camera,
    depths: jax.Array,  # (C, H, W) expected view-z depth
    valids: jax.Array,  # (C, H, W) alpha coverage in [0, 1]
    bbox_min,
    bbox_max,
    resolution: int = 192,
    trunc: float | None = None,
    return_weights: bool = False,
):
    """(R, R, R) fused TSDF: negative behind surfaces, +1 in free space.

    ``trunc`` defaults to 3 voxel diagonals.  With ``return_weights``
    also returns the per-voxel IN-BAND weight sum — how many views
    observed an actual surface within one truncation band of the voxel
    (0 = no direct surface evidence).
    """
    bbox_min = np.asarray(bbox_min, np.float32)
    bbox_max = np.asarray(bbox_max, np.float32)
    spacing = (bbox_max - bbox_min) / (resolution - 1)
    if trunc is None:
        trunc = 3.0 * float(np.linalg.norm(spacing))
    xs = np.linspace(bbox_min[0], bbox_max[0], resolution)
    ys = np.linspace(bbox_min[1], bbox_max[1], resolution)
    zs = np.linspace(bbox_min[2], bbox_max[2], resolution)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = jnp.asarray(
        np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    )
    h, w = depths.shape[1:]
    # a pixel is TRUE background only if its whole neighborhood is empty
    # — an isolated low-alpha pixel is a splat-gap leak, not free space,
    # and must not carve through the object
    alpha_dil = jnp.asarray(_window_max(np.asarray(valids), r=2))

    @jax.jit
    def fuse(depths, valids, alpha_dil):
        def per_cam(carry, i):
            acc, wsum, band = carry
            cam = index_camera(cams, i)
            uv, z = cam.project(pts)
            ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
            vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
            in_img = (
                (uv[:, 0] >= -0.5) & (uv[:, 0] <= w - 0.5)
                & (uv[:, 1] >= -0.5) & (uv[:, 1] <= h - 0.5)
                & (z > 1e-3)
            )
            # three-way pixel evidence: alpha≈1 → surface at its depth
            # (full weight); alpha≈0 → true background, free space to
            # infinity (reduced weight, so a few rays leaking through
            # splat gaps cannot outvote solid surface observations);
            # partial alpha → silhouette/leak, UNKNOWN (no evidence)
            a = valids[i][vi, ui]
            is_surf = a > 0.5
            is_free = alpha_dil[i][vi, ui] < 0.1
            d = jnp.where(is_surf, depths[i][vi, ui], 1e9)
            sd = (d - z) / trunc
            tsdf = jnp.clip(sd, -1.0, 1.0)
            # weights: full only inside the truncation band around a
            # surface observation; FAR-in-front carving (sd > 1) and
            # true-background carving get reduced weight — a single
            # mis-located depth (e.g. a level-set crossing that slipped
            # to the back surface) must not outvote the interior prior.
            # Space more than one band BEHIND a surface is occluded.
            in_band = is_surf & (sd > -1.0) & (sd <= 1.0)
            carving = (is_free | (is_surf & (sd > 1.0)))
            wgt = jnp.where(
                in_img,
                jnp.where(in_band, 1.0, jnp.where(carving, 0.25, 0.0)),
                0.0,
            )
            wband = jnp.where(in_band, 1.0, 0.0)
            return (acc + wgt * tsdf, wsum + wgt, band + wband), None

        init = (
            jnp.zeros(pts.shape[0], jnp.float32),
            jnp.zeros(pts.shape[0], jnp.float32),
            jnp.zeros(pts.shape[0], jnp.float32),
        )
        (acc, wsum, band), _ = jax.lax.scan(
            per_cam, init, jnp.arange(depths.shape[0])
        )
        # weak "solid" prior: space with no/contradictory observations
        # is behind surfaces from every view = interior.  Strong local
        # evidence (in-band weight 1, or several agreeing carvers)
        # dominates; a lone stray carver cannot hollow the object.
        prior_w = 0.3
        return (acc - prior_w) / (wsum + prior_w), band

    phi, band = fuse(jnp.asarray(depths), jnp.asarray(valids), alpha_dil)
    shape = (resolution,) * 3
    phi = np.asarray(phi).reshape(shape)
    if return_weights:
        return phi, np.asarray(band).reshape(shape)
    return phi


def render_depth_maps(
    g: Gaussians,
    cams: Camera,
    config: RasterConfig = RasterConfig(),
    every_nth: int = 3,
    pixel_stride: int = 2,
    level: float = 0.3,
):
    """Level-set depth + coverage maps per camera.

    Depth comes from the SuGaR density level crossing along each pixel
    ray (sugar/levelset.py) — the MEDIAN surface, not the alpha-weighted
    mean depth, which on semi-transparent splat scenes blends front and
    back surfaces into phantom mid-interior evidence.
    """
    from autovfx_tpu.sugar.levelset import level_surface_from_camera

    idxs = list(range(0, num_cameras(cams), every_nth))
    render = jax.jit(lambda g, cam: rasterize(g, cam, config=config))
    depths, valids, sub_list = [], [], []
    for i in idxs:
        cam = index_camera(cams, i)
        cam_s = cam.resized(pixel_stride)
        hs, ws = cam_s.height, cam_s.width
        h2 = len(range(0, cam.height, pixel_stride))
        w2 = len(range(0, cam.width, pixel_stride))
        out = render(g, cam)
        a = np.asarray(out.alpha)[::pixel_stride, ::pixel_stride][
            :hs, :ws
        ]
        ls = level_surface_from_camera(
            g, cam, config=config, level=level, pixel_stride=pixel_stride
        )
        _, z = cam.project(ls.points)
        zmap = np.asarray(z).reshape(h2, w2)[:hs, :ws]
        ok = np.asarray(ls.valid).reshape(h2, w2)[:hs, :ws]
        depths.append(np.where(ok, zmap, 1e9).astype(np.float32))
        # pixels covered but without a clean crossing are UNKNOWN
        # (alpha forced into the 3-way rule's middle band)
        valids.append(np.where(ok, a, np.minimum(a, 0.49)).astype(
            np.float32
        ))
        sub_list.append(cam_s)
    from autovfx_tpu.core.cameras import stack_cameras

    return stack_cameras(sub_list), np.stack(depths), np.stack(valids)


def tsdf_mesh(
    g: Gaussians,
    cams: Camera,
    bbox_min,
    bbox_max,
    config: RasterConfig = RasterConfig(),
    resolution: int = 192,
    every_nth: int = 3,
):
    """Depth-render → TSDF-fuse → marching tetrahedra at φ = 0."""
    sub, depths, valids = render_depth_maps(
        g, cams, config=config, every_nth=every_nth
    )
    phi, band = tsdf_fuse(
        sub, depths, valids, bbox_min, bbox_max, resolution=resolution,
        return_weights=True,
    )
    # dilate surface evidence by 2 voxels (marching verts may sit in a
    # cell adjacent to the observed band)
    band_d = band
    for ax in (0, 1, 2):
        for sh in (-2, -1, 1, 2):
            band_d = np.maximum(band_d, np.roll(band, sh, axis=ax))
    bbox_min = np.asarray(bbox_min, np.float32)
    spacing = (
        np.asarray(bbox_max, np.float32) - bbox_min
    ) / (resolution - 1)
    # marching_tetrahedra meshes {field >= level}: inside = -φ >= 0
    verts, faces = marching_tetrahedra(-phi, 0.0, bbox_min, spacing)
    if len(verts):
        # no surface evidence, no surface: drop crossings that are
        # only the carve-vs-prior boundary at the edge of covered
        # space, not observed geometry
        cell = np.clip(
            ((verts - bbox_min[None]) / spacing[None]).astype(np.int64),
            0, resolution - 1,
        )
        w = band_d[cell[:, 0], cell[:, 1], cell[:, 2]]
        keep_v = w > 0.5  # at least one direct surface observation
        keep_f = keep_v[faces].all(axis=1)
        faces = faces[keep_f]
        used = np.zeros(len(verts), bool)
        used[faces.reshape(-1)] = True
        new_id = np.cumsum(used) - 1
        verts = verts[used]
        faces = new_id[faces]
    return verts, faces
