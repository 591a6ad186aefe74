"""Mesh → surfel-Gaussian conversion for inserted-object rendering.

TPU-first replacement for Cycles' object pass (rgb_obj,
all_rendering.py:2440-2558): instead of path-tracing the mesh, we sample
it into flat, normal-aligned surfel Gaussians shaded by the envmap IBL
and rasterize them with the same Pallas splat renderer as the scene —
one renderer, one compositing model, exact shared depth test.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.core.quaternion import rotmat_to_quat
from autovfx_tpu.core.sh import rgb_to_sh


def sample_mesh_surfels(
    vertices: np.ndarray,
    faces: np.ndarray,
    num_samples: int = 100_000,
    vertex_colors: Optional[np.ndarray] = None,
    uv: Optional[np.ndarray] = None,
    texture: Optional[np.ndarray] = None,
    seed: int = 0,
):
    """Host-side: area-weighted surface samples.

    Returns dict(points, normals, colors, radii) as numpy arrays; radii
    are per-sample surfel radii sized so the surfels tile the surface
    (≈ sqrt(area_total / num_samples)).
    """
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    cross = np.cross(b - a, c - a)
    area2 = np.linalg.norm(cross, axis=1)
    area = 0.5 * area2
    total_area = float(area.sum())
    p = area / max(area.sum(), 1e-12)
    rng = np.random.RandomState(seed)
    tri = rng.choice(len(f), size=num_samples, p=p)
    r1 = np.sqrt(rng.uniform(size=(num_samples, 1)))
    r2 = rng.uniform(size=(num_samples, 1))
    w0 = 1 - r1
    w1 = r1 * (1 - r2)
    w2 = r1 * r2
    pts = w0 * a[tri] + w1 * b[tri] + w2 * c[tri]
    normals = cross[tri] / np.maximum(area2[tri][:, None], 1e-12)

    if vertex_colors is not None:
        vc = np.asarray(vertex_colors, np.float64)
        cols = (
            w0 * vc[f[tri, 0]] + w1 * vc[f[tri, 1]] + w2 * vc[f[tri, 2]]
        )
    elif uv is not None and texture is not None:
        uvs = (
            w0 * uv[f[tri, 0]] + w1 * uv[f[tri, 1]] + w2 * uv[f[tri, 2]]
        )
        th, tw, _ = texture.shape
        xi = np.clip((uvs[:, 0] % 1.0) * tw, 0, tw - 1).astype(int)
        yi = np.clip(((1 - uvs[:, 1]) % 1.0) * th, 0, th - 1).astype(int)
        cols = np.asarray(texture, np.float64)[yi, xi] / (
            255.0 if texture.dtype == np.uint8 else 1.0
        )
    else:
        cols = np.full((num_samples, 3), 0.7)

    radius = np.sqrt(total_area / max(num_samples, 1)) * 1.1
    return {
        "points": pts.astype(np.float32),
        "normals": normals.astype(np.float32),
        "colors": cols.astype(np.float32),
        "radius": np.float32(radius),
        # (triangle, barycentric) associations — animated-mesh playback
        # repositions surfels on deformed vertices (edit/gltf_anim.py)
        "tri": tri.astype(np.int64),
        "bary": np.concatenate([w0, w1, w2], axis=1).astype(np.float32),
    }


def surfels_to_gaussians(
    points: jax.Array,
    normals: jax.Array,
    colors: jax.Array,
    radius: float,
    opacity: float = 0.95,
    flat_ratio: float = 0.1,
) -> Gaussians:
    """Build normal-aligned flat Gaussians (min axis = normal)."""
    n = points.shape[0]
    nrm = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
    )
    # build tangent frame (t1, t2, n); rotation columns = axes
    helper = jnp.where(
        jnp.abs(nrm[:, 2:3]) < 0.9,
        jnp.array([0.0, 0.0, 1.0]),
        jnp.array([1.0, 0.0, 0.0]),
    )
    t1 = jnp.cross(helper, nrm)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(nrm, t1)
    rot = jnp.stack([t1, t2, nrm], axis=-1)  # (N, 3, 3) columns
    quats = rotmat_to_quat(rot)
    log_scales = jnp.log(
        jnp.stack(
            [
                jnp.full((n,), radius),
                jnp.full((n,), radius),
                jnp.full((n,), radius * flat_ratio),
            ],
            axis=-1,
        )
    )
    import numpy as _np

    op_logit = float(_np.log(opacity / (1 - opacity)))
    return Gaussians(
        xyz=points,
        sh_dc=rgb_to_sh(colors),
        sh_rest=jnp.zeros((n, 15, 3), jnp.float32),
        log_scales=log_scales,
        quats=quats,
        opacity_logit=jnp.full((n,), op_logit),
        active=jnp.ones((n,), bool),
    )


def shaded_object_gaussians(
    surfels: dict,
    env: jax.Array,
    env_sh: jax.Array,
    cam_center: jax.Array,
    base_color: Optional[jax.Array] = None,
    roughness: float = 0.5,
    metallic: float = 0.0,
    transform: Optional[tuple] = None,
    env_ggx: Optional[jax.Array] = None,
    mirror_scene: Optional[tuple] = None,
    emitter=None,
) -> Gaussians:
    """Apply (scale, R, t) transform, IBL-shade, return surfel Gaussians.

    transform: (scale (float), rot (3,3), translation (3,)) applied as
    world = R @ (scale · p) + t (the rb_transform convention).
    env_ggx: prefiltered GGX radiance stack (ibl.prefilter_envmap_ggx).
    mirror_scene: (tri_a, tri_b, tri_c, tri_color) of the (decimated)
    scene mesh — when given and the material is a mirror, reflection
    rays return scene content (ibl.mirror_scene_reflection).
    """
    from autovfx_tpu.render import ibl

    pts = jnp.asarray(surfels["points"])
    nrm = jnp.asarray(surfels["normals"])
    cols = jnp.asarray(surfels["colors"])
    radius = float(surfels["radius"])
    if transform is not None:
        from autovfx_tpu.utils.linalg import apply_rotation

        s, r, t = transform
        pts = apply_rotation(pts * s, r) + t
        nrm = apply_rotation(nrm, r)
        radius = radius * float(s)

    view = pts - cam_center[None, :]
    view = view / jnp.maximum(jnp.linalg.norm(view, -1, keepdims=True), 1e-12)
    # flip normals toward the camera for shading robustness on open meshes
    facing = jnp.sum(nrm * view, axis=-1, keepdims=True)
    nrm_s = jnp.where(facing > 0, -nrm, nrm)
    albedo = cols if base_color is None else cols * base_color
    # per-surfel roughness (material-map sampled, render/materials.py)
    # overrides the scalar default
    if "roughness" in surfels:
        roughness = jnp.asarray(surfels["roughness"])[:, None]
    scene_spec = scene_mask = None
    if mirror_scene is not None:
        ta, tb, tc, tcol = mirror_scene
        ndv = jnp.maximum(jnp.sum(nrm_s * (-view), axis=-1, keepdims=True), 0.0)
        refl = 2.0 * ndv * nrm_s + view
        scene_spec, hit = ibl.mirror_scene_reflection(
            pts, refl, ta, tb, tc, tcol, env_sh
        )
        scene_mask = hit[:, None]
    shaded = ibl.shade(
        nrm_s, view, env, env_sh, albedo, roughness=roughness,
        metallic=metallic, env_ggx=env_ggx,
        scene_spec=scene_spec, scene_spec_mask=scene_mask,
    )
    if emitter is not None:
        # indoor emitter mesh: direct area-light term (render/emitter)
        from autovfx_tpu.render.emitter import emitter_irradiance

        shaded = shaded + albedo * emitter_irradiance(
            pts, nrm_s, emitter
        )
    return surfels_to_gaussians(pts, nrm_s, shaded, radius)
