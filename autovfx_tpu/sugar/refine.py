"""Refined SuGaR: mesh-bound Gaussians + texture baking.

Parity target: ``sugar_scene/sugar_model.py`` —
mesh-bound mode (:170-210: n ∈ {1,3,4,6} Gaussians per triangle at fixed
barycentric coords; 2D learnable scales + complex-number in-plane
rotation :322-337; colors from barycentric vertex colors :212-218),
texture baking (:2398-2616 per-triangle UV squares + SH→image), and
``convert_refined_sugar_into_gaussians`` (:2617-2638).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

import flax.struct

from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.core.quaternion import rotmat_to_quat
from autovfx_tpu.core.sh import rgb_to_sh
from autovfx_tpu.edit.mesh_io import Mesh

# fixed barycentric coords per gaussians-per-triangle count
# (sugar_model.py:170-210)
_BARY = {
    1: np.array([[1 / 3, 1 / 3, 1 / 3]], np.float32),
    3: np.array(
        [[1 / 2, 1 / 4, 1 / 4], [1 / 4, 1 / 2, 1 / 4], [1 / 4, 1 / 4, 1 / 2]],
        np.float32,
    ),
    4: np.array(
        [
            [1 / 3, 1 / 3, 1 / 3],
            [2 / 3, 1 / 6, 1 / 6],
            [1 / 6, 2 / 3, 1 / 6],
            [1 / 6, 1 / 6, 2 / 3],
        ],
        np.float32,
    ),
    6: np.array(
        [
            [2 / 3, 1 / 6, 1 / 6],
            [1 / 6, 2 / 3, 1 / 6],
            [1 / 6, 1 / 6, 2 / 3],
            [1 / 6, 5 / 12, 5 / 12],
            [5 / 12, 1 / 6, 5 / 12],
            [5 / 12, 5 / 12, 1 / 6],
        ],
        np.float32,
    ),
}


@flax.struct.dataclass
class BoundGaussians:
    """Learnable surface-bound splats (positions derive from the mesh)."""

    vertices: jax.Array  # (V, 3) — learnable (refinement moves the mesh)
    faces: jax.Array = flax.struct.field(pytree_node=False)  # (F, 3)
    bary: jax.Array = flax.struct.field(pytree_node=False)  # (n, 3)
    log_scales2d: jax.Array = None  # (F*n, 2) tangent-plane scales
    rot_complex: jax.Array = None  # (F*n, 2) in-plane rotation (cos, sin)
    vertex_colors: jax.Array = None  # (V, 3) learnable vertex colors
    opacity_logit: jax.Array = None  # (F*n,)
    thickness_ratio: float = flax.struct.field(
        pytree_node=False, default=0.05
    )

    @property
    def num_gaussians(self) -> int:
        return self.faces.shape[0] * self.bary.shape[0]


def bind_to_mesh(
    mesh: Mesh, n_per_triangle: int = 1, initial_opacity: float = 0.9
) -> BoundGaussians:
    v = jnp.asarray(mesh.vertices, jnp.float32)
    f = jnp.asarray(mesh.faces, jnp.int32)
    bary = jnp.asarray(_BARY[n_per_triangle])
    n = mesh.faces.shape[0] * n_per_triangle
    # initial 2D scale ~ triangle size
    e1 = mesh.vertices[mesh.faces[:, 1]] - mesh.vertices[mesh.faces[:, 0]]
    e2 = mesh.vertices[mesh.faces[:, 2]] - mesh.vertices[mesh.faces[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    s0 = np.sqrt(np.maximum(area / max(n_per_triangle, 1), 1e-12))
    log_s = np.log(np.repeat(s0, n_per_triangle))[:, None].repeat(2, 1)
    vc = (
        mesh.vertex_colors
        if mesh.vertex_colors is not None
        else np.full((len(mesh.vertices), 3), 0.5, np.float32)
    )
    op = float(np.log(initial_opacity / (1 - initial_opacity)))
    return BoundGaussians(
        vertices=v,
        faces=f,
        bary=bary,
        log_scales2d=jnp.asarray(log_s, jnp.float32),
        rot_complex=jnp.concatenate(
            [jnp.ones((n, 1)), jnp.zeros((n, 1))], axis=1
        ),
        vertex_colors=jnp.asarray(vc, jnp.float32),
        opacity_logit=jnp.full((n,), op, jnp.float32),
    )


def realize(bg: BoundGaussians) -> Gaussians:
    """Materialize bound splats as a standard Gaussians pytree
    (convert_refined_sugar_into_gaussians, sugar_model.py:2617-2638)."""
    v = bg.vertices
    f = bg.faces
    tri = v[f]  # (F, 3, 3)
    n_b = bg.bary.shape[0]
    centers = jnp.einsum("bk,fkj->fbj", bg.bary, tri).reshape(-1, 3)

    # tangent frame per triangle
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    nrm = jnp.cross(e1, e2)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, -1, keepdims=True), 1e-12)
    t1 = e1 / jnp.maximum(jnp.linalg.norm(e1, -1, keepdims=True), 1e-12)
    t2 = jnp.cross(nrm, t1)

    t1 = jnp.repeat(t1, n_b, axis=0)
    t2 = jnp.repeat(t2, n_b, axis=0)
    nrm_r = jnp.repeat(nrm, n_b, axis=0)

    # in-plane rotation by the complex number (cos, sin)
    c = bg.rot_complex / jnp.maximum(
        jnp.linalg.norm(bg.rot_complex, -1, keepdims=True), 1e-9
    )
    a1 = c[:, 0:1] * t1 + c[:, 1:2] * t2
    a2 = -c[:, 1:2] * t1 + c[:, 0:1] * t2
    rot = jnp.stack([a1, a2, nrm_r], axis=-1)  # columns = axes
    quats = rotmat_to_quat(rot)

    s2d = jnp.exp(bg.log_scales2d)
    thickness = bg.thickness_ratio * jnp.min(s2d, axis=-1, keepdims=True)
    log_scales = jnp.log(
        jnp.concatenate([s2d, thickness], axis=-1)
    )

    colors = jnp.einsum(
        "bk,fkj->fbj", bg.bary, bg.vertex_colors[f]
    ).reshape(-1, 3)

    n = centers.shape[0]
    return Gaussians(
        xyz=centers,
        sh_dc=rgb_to_sh(jnp.clip(colors, 0.0, 1.0)),
        sh_rest=jnp.zeros((n, 15, 3), jnp.float32),
        log_scales=log_scales,
        quats=quats,
        opacity_logit=bg.opacity_logit,
        active=jnp.ones((n,), bool),
    )


def splat_mesh(
    bg: BoundGaussians, cam, mode: str = "perspective"
) -> "Mesh":
    """Project each face's vertices to its centroid's viewing depth
    (sugar_model.py:567-601): triangles become screen-space "splats"
    whose rasterized footprint matches the bound Gaussians' — used to
    render the refined textured mesh without a surface rasterizer.

    mode 'depth' snaps vertex view-z to the centroid z; 'perspective'
    rescales vertices along their view rays so their projection onto
    the centroid direction matches the centroid's.
    """
    from autovfx_tpu.utils.linalg import transform_points

    v = bg.vertices
    f = bg.faces
    tri = v[f]  # (F, 3, 3)
    centers = jnp.mean(tri, axis=1, keepdims=True)  # (F, 1, 3)
    tri_cam = transform_points(tri.reshape(-1, 3), cam.R, cam.t).reshape(
        tri.shape
    )
    ctr_cam = transform_points(
        centers.reshape(-1, 3), cam.R, cam.t
    ).reshape(centers.shape)
    if mode == "depth":
        new_cam = tri_cam.at[..., 2].set(ctr_cam[..., 2])
    else:
        proj_dir = ctr_cam / jnp.maximum(
            jnp.linalg.norm(ctr_cam, axis=-1, keepdims=True), 1e-12
        )
        verts_proj = jnp.sum(tri_cam * proj_dir, axis=-1, keepdims=True)
        ctr_proj = jnp.sum(ctr_cam * proj_dir, axis=-1, keepdims=True)
        new_cam = (
            ctr_proj / jnp.where(jnp.abs(verts_proj) > 1e-9, verts_proj,
                                 1e-9)
        ) * tri_cam
    # back to world: p_w = Rᵀ (p_c - t)
    flat = new_cam.reshape(-1, 3) - cam.t[None]
    world = jnp.einsum("ji,nj->ni", cam.R, flat)
    faces = np.arange(f.shape[0] * 3, dtype=np.int64).reshape(-1, 3)
    vc = np.asarray(
        jnp.einsum("bk,fkj->fbj", bg.bary[:1], bg.vertex_colors[f])
    ).reshape(-1, 3)
    vc = np.repeat(vc, 3, axis=0)
    return Mesh(
        vertices=np.asarray(world, np.float32),
        faces=faces,
        vertex_colors=np.clip(vc, 0.0, 1.0).astype(np.float32),
    )


def bake_texture(
    bg: BoundGaussians, texture_size: int = 1024, square_size: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Bake per-triangle color squares into a UV atlas
    (extract_texture_image_and_uv_from_gaussians, sugar_model.py:2398-2616).

    Returns (texture (S, S, 3) float, per-vertex uv (F*3, 2)) with each
    triangle owning half of an 8x8 texel square.
    """
    f = np.asarray(bg.faces)
    vc = np.asarray(bg.vertex_colors)
    n_faces = len(f)
    per_row = texture_size // square_size
    n_squares = per_row * per_row
    assert n_faces <= 2 * n_squares, "texture too small for face count"

    sq = np.arange(n_faces) // 2
    upper = np.arange(n_faces) % 2 == 0
    row = sq // per_row
    col = sq % per_row
    x0 = col * square_size
    y0 = row * square_size

    # barycentric-gradient fill (vectorized over faces): the upper-left
    # triangle maps its vertices to square coords (0,0),(1,0),(0,1); the
    # lower-right to (1,1),(0,1),(1,0).  Per-texel barycentric weights
    # are affine in (u, v) and shared by every square.
    g = (np.arange(square_size) + 0.5) / square_size
    uu, vv = np.meshgrid(g, g)  # (s, s) texel centers
    w_up = np.stack([1.0 - uu - vv, uu, vv], axis=-1)
    w_lo = np.stack([uu + vv - 1.0, 1.0 - uu, 1.0 - vv], axis=-1)
    # clamp + renormalize so texels across the diagonal extrapolate
    # sanely (they belong to the other triangle; bleeding matches it)
    for w in (w_up, w_lo):
        np.clip(w, 0.0, None, out=w)
        w /= np.maximum(w.sum(-1, keepdims=True), 1e-9)

    tri_col = vc[f]  # (F, 3, 3)
    w_face = np.where(upper[:, None, None, None], w_up, w_lo)  # (F,s,s,3)
    squares = np.einsum("fyxk,fkc->fyxc", w_face, tri_col)  # (F,s,s,3)

    tex = np.zeros((texture_size, texture_size, 3), np.float32)
    # two faces share a square: blend by per-texel triangle membership
    # (upper face wins above the anti-diagonal, lower below)
    up_mask = (uu + vv <= 1.0)[..., None]
    for i in range(n_faces):
        ys, xs = slice(y0[i], y0[i] + square_size), slice(
            x0[i], x0[i] + square_size
        )
        m = up_mask if upper[i] else ~up_mask
        tex[ys, xs] = np.where(m, squares[i], tex[ys, xs])

    eps = 1.0 / texture_size
    s = square_size / texture_size
    u0 = x0 / texture_size
    v0 = y0 / texture_size
    uv = np.where(
        upper[:, None, None],
        np.stack(
            [
                np.stack([u0 + eps, v0 + eps], -1),
                np.stack([u0 + s - eps, v0 + eps], -1),
                np.stack([u0 + eps, v0 + s - eps], -1),
            ],
            axis=1,
        ),
        np.stack(
            [
                np.stack([u0 + s - eps, v0 + s - eps], -1),
                np.stack([u0 + eps, v0 + s - eps], -1),
                np.stack([u0 + s - eps, v0 + eps], -1),
            ],
            axis=1,
        ),
    ).astype(np.float32)
    return tex, uv.reshape(-1, 2)


def postprocess_bound_mesh(
    bg: BoundGaussians,
    iterations: int = 1,
    min_opacity: float = 0.1,
) -> BoundGaussians:
    """Strip low-support border faces before export
    (refined_mesh.py:129-191): iteratively remove faces with an
    unshared edge (mesh border), then re-add removed faces whose bound
    Gaussians keep high opacity (the reference re-adds by density).
    Per-face Gaussian parameters are carried to the trimmed mesh.
    """
    faces = np.asarray(bg.faces)
    n_b = bg.bary.shape[0]
    keep = np.ones(len(faces), bool)
    for _ in range(max(iterations, 0)):
        e = np.concatenate(
            [faces[keep][:, [0, 1]], faces[keep][:, [1, 2]],
             faces[keep][:, [2, 0]]], axis=0
        )
        e = np.sort(e, axis=1)
        uniq, counts = np.unique(e, axis=0, return_counts=True)
        shared = {tuple(k) for k, c in zip(uniq, counts) if c >= 2}
        kept_idx = np.nonzero(keep)[0]
        fk = faces[kept_idx]
        inside = np.array(
            [
                tuple(sorted((a, b))) in shared
                and tuple(sorted((b, c))) in shared
                and tuple(sorted((c, a))) in shared
                for a, b, c in fk
            ]
        )
        keep[kept_idx] = inside
    # re-add removed faces whose splats still carry real opacity
    op = 1.0 / (1.0 + np.exp(-np.asarray(bg.opacity_logit)))
    face_op = op.reshape(len(faces), n_b).mean(axis=1)
    keep |= (~keep) & (face_op > min_opacity)

    g_keep = np.repeat(keep, n_b)
    return bg.replace(
        faces=jnp.asarray(faces[keep]),
        log_scales2d=bg.log_scales2d[jnp.asarray(g_keep)],
        rot_complex=bg.rot_complex[jnp.asarray(g_keep)],
        opacity_logit=bg.opacity_logit[jnp.asarray(g_keep)],
    )


def export_refined_mesh(
    bg: BoundGaussians,
    path: str,
    texture_size: int = 1024,
    square_size: int = 8,
) -> None:
    """Write the refined surface as OBJ + MTL + PNG texture
    (refined_mesh.py:14-226 equivalent: textured-mesh export driver)."""
    import os

    tex, uv = bake_texture(bg, texture_size, square_size)
    base, _ = os.path.splitext(path)
    name = os.path.basename(base)
    v = np.asarray(bg.vertices)
    f = np.asarray(bg.faces)

    from PIL import Image

    Image.fromarray(
        (np.clip(tex, 0.0, 1.0) * 255).astype(np.uint8)
    ).save(base + ".png")
    with open(base + ".mtl", "w") as fh:
        fh.write(
            f"newmtl material_0\nKd 1.0 1.0 1.0\nmap_Kd {name}.png\n"
        )
    lines = [f"mtllib {name}.mtl", "usemtl material_0"]
    lines += [f"v {a:.6f} {b:.6f} {c:.6f}" for a, b, c in v]
    # OBJ vt origin is bottom-left; texture rows are top-down
    lines += [f"vt {u:.6f} {1.0 - w:.6f}" for u, w in uv]
    for i, (a, b, c) in enumerate(f):
        t = 3 * i
        lines.append(
            f"f {a + 1}/{t + 1} {b + 1}/{t + 2} {c + 1}/{t + 3}"
        )
    with open(base + ".obj", "w") as fh:
        fh.write("\n".join(lines) + "\n")
