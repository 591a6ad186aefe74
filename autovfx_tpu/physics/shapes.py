"""Collision shapes: convex hulls (host build) + static triangle-mesh grid.

Parity target: Blender's Bullet setup in ``blender/all_rendering.py``
(add_rigid_body:794-818 — inserted objects become CONVEX_HULL actives,
the scene mesh a PASSIVE 'MESH' collider :2328).

TPU-first: hulls are padded (max faces / max verts) plane+vertex sets so
contact generation is fixed-shape vectorized math; the scene mesh is
bucketed into a uniform grid on the host, queried in-jit by gathering a
fixed number of candidate triangles per cell.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class ConvexHullShape(NamedTuple):
    """Padded convex hull (body frame, centered at center of mass)."""

    verts: jax.Array  # (B, Vmax, 3)
    vert_mask: jax.Array  # (B, Vmax)
    planes: jax.Array  # (B, Fmax, 4)  n·x <= d  (outward normals)
    plane_mask: jax.Array  # (B, Fmax)
    radius: jax.Array  # (B,) bounding-sphere radius


def build_hulls(meshes_vertices: list[np.ndarray], max_verts: int = 64,
                max_faces: int = 64):
    """Host-side: scipy convex hulls, decimated to padded budgets.

    Returns (ConvexHullShape, coms (B,3), volumes (B,), inertias (B,3,3))
    with vertices expressed about the center of mass (uniform density 1).
    """
    from scipy.spatial import ConvexHull

    b = len(meshes_vertices)
    verts = np.zeros((b, max_verts, 3), np.float32)
    vmask = np.zeros((b, max_verts), bool)
    planes = np.zeros((b, max_faces, 4), np.float32)
    pmask = np.zeros((b, max_faces), bool)
    radius = np.zeros((b,), np.float32)
    coms = np.zeros((b, 3), np.float32)
    vols = np.zeros((b,), np.float32)
    inertias = np.zeros((b, 3, 3), np.float32)

    for i, pts in enumerate(meshes_vertices):
        pts = np.asarray(pts, np.float64)
        hull = ConvexHull(pts)
        com, vol, inertia = _hull_mass_properties(
            pts[hull.vertices], hull.points, hull.simplices
        )
        coms[i] = com
        vols[i] = vol
        inertias[i] = inertia
        v = pts[hull.vertices] - com
        if len(v) > max_verts:
            # farthest-point decimation keeps the silhouette
            v = _farthest_points(v, max_verts)
        verts[i, : len(v)] = v
        vmask[i, : len(v)] = True
        # planes from the hull of the (possibly decimated) vertex set
        h2 = ConvexHull(v)
        eq = h2.equations  # (F, 4): n·x + c <= 0
        if len(eq) > max_faces:
            keep = _diverse_planes(eq, max_faces)
            eq = eq[keep]
        planes[i, : len(eq), :3] = eq[:, :3]
        planes[i, : len(eq), 3] = -eq[:, 3]
        pmask[i, : len(eq)] = True
        radius[i] = np.linalg.norm(v, axis=1).max()

    shape = ConvexHullShape(
        verts=jnp.asarray(verts),
        vert_mask=jnp.asarray(vmask),
        planes=jnp.asarray(planes),
        plane_mask=jnp.asarray(pmask),
        radius=jnp.asarray(radius),
    )
    return shape, coms, vols, inertias


def _hull_mass_properties(hull_pts, all_pts, simplices):
    """Uniform-density COM / volume / unit-mass inertia via tetrahedra."""
    ref = hull_pts.mean(axis=0)
    com = np.zeros(3)
    vol = 0.0
    for tri in simplices:
        a, b_, c = all_pts[tri[0]] - ref, all_pts[tri[1]] - ref, all_pts[tri[2]] - ref
        v = abs(np.dot(a, np.cross(b_, c))) / 6.0
        centroid = (a + b_ + c) / 4.0
        com += v * centroid
        vol += v
    com = ref + (com / max(vol, 1e-12))
    # inertia by sampling (robust, good to ~1%)
    rng = np.random.RandomState(0)
    lo, hi = hull_pts.min(0), hull_pts.max(0)
    samples = rng.uniform(lo, hi, size=(8192, 3))
    from scipy.spatial import Delaunay

    inside = Delaunay(hull_pts).find_simplex(samples) >= 0
    pts_in = samples[inside] - com
    if len(pts_in) < 16:
        pts_in = hull_pts - com
    r2 = (pts_in**2).sum(1)
    eye = np.eye(3)
    inertia = (
        (r2[:, None, None] * eye - pts_in[:, :, None] * pts_in[:, None, :])
        .mean(0)
    )
    return com, vol, inertia.astype(np.float32)


def _farthest_points(v, k):
    sel = [int(np.argmax(np.linalg.norm(v, axis=1)))]
    d = np.linalg.norm(v - v[sel[0]], axis=1)
    for _ in range(k - 1):
        i = int(np.argmax(d))
        sel.append(i)
        d = np.minimum(d, np.linalg.norm(v - v[i], axis=1))
    return v[sel]


def _diverse_planes(eq, k):
    n = eq[:, :3]
    sel = [0]
    score = 1.0 - n @ n[0]
    for _ in range(k - 1):
        i = int(np.argmax(score))
        sel.append(i)
        score = np.minimum(score, 1.0 - n @ n[i])
    return np.array(sel)


# ---- static scene mesh collider -------------------------------------------------


class MeshGrid(NamedTuple):
    """Uniform-grid triangle bucketing of the scene mesh."""

    tri_a: jax.Array  # (T, 3)
    tri_b: jax.Array
    tri_c: jax.Array
    tri_n: jax.Array  # (T, 3) unit normals
    cell_tris: jax.Array  # (C, M) triangle ids per cell (-1 pad)
    origin: jax.Array  # (3,)
    cell_size: jax.Array  # ()
    dims: tuple  # (nx, ny, nz) static


def build_mesh_grid(
    vertices: np.ndarray,
    faces: np.ndarray,
    resolution: int = 48,
    max_per_cell: int = 64,
) -> MeshGrid:
    """Host-side bucketing of triangles into a uniform grid (AABB-based)."""
    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int64)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    n = np.cross(b - a, c - a)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)

    lo = v.min(0) - 1e-3
    hi = v.max(0) + 1e-3
    extent = hi - lo
    cell = float(extent.max()) / resolution
    dims = np.maximum(np.ceil(extent / cell).astype(int), 1)
    nx, ny, nz = int(dims[0]), int(dims[1]), int(dims[2])
    n_cells = nx * ny * nz

    cell_lists = [[] for _ in range(n_cells)]
    # inflate by one cell so queries from penetrating/nearby points in
    # neighboring cells still see the triangle (anti-tunneling)
    tmin = np.floor((np.minimum(np.minimum(a, b), c) - lo) / cell).astype(int) - 1
    tmax = np.floor((np.maximum(np.maximum(a, b), c) - lo) / cell).astype(int) + 1
    tmin = np.clip(tmin, 0, dims - 1)
    tmax = np.clip(tmax, 0, dims - 1)
    for t in range(len(f)):
        for ix in range(tmin[t, 0], tmax[t, 0] + 1):
            for iy in range(tmin[t, 1], tmax[t, 1] + 1):
                for iz in range(tmin[t, 2], tmax[t, 2] + 1):
                    idx = (ix * ny + iy) * nz + iz
                    if len(cell_lists[idx]) < max_per_cell:
                        cell_lists[idx].append(t)

    cell_tris = -np.ones((n_cells, max_per_cell), np.int32)
    for i, lst in enumerate(cell_lists):
        cell_tris[i, : len(lst)] = lst

    return MeshGrid(
        tri_a=jnp.asarray(a),
        tri_b=jnp.asarray(b),
        tri_c=jnp.asarray(c),
        tri_n=jnp.asarray(n),
        cell_tris=jnp.asarray(cell_tris),
        origin=jnp.asarray(lo),
        cell_size=jnp.float32(cell),
        dims=(nx, ny, nz),
    )


def _closest_point_on_triangle(p, a, b, c):
    """Vectorized Ericson closest-point-on-triangle."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_bc = (d4 - d3) + (d5 - d6)
    w_bc = jnp.clip((d4 - d3) / jnp.where(denom_bc != 0, denom_bc, 1.0), 0, 1)

    denom = jnp.where(va + vb + vc != 0, va + vb + vc, 1.0)
    v = vb / denom
    w = vc / denom
    pt_face = a + v[..., None] * ab + w[..., None] * ac

    t_ab = jnp.clip(d1 / jnp.where(d1 - d3 != 0, d1 - d3, 1.0), 0, 1)
    pt_ab = a + t_ab[..., None] * ab
    t_ac = jnp.clip(d2 / jnp.where(d2 - d6 != 0, d2 - d6, 1.0), 0, 1)
    pt_ac = a + t_ac[..., None] * ac
    pt_bc = b + w_bc[..., None] * (c - b)

    pt = pt_face
    # region selection (Ericson, branch-free)
    cond_a = (d1 <= 0) & (d2 <= 0)
    cond_b = (d3 >= 0) & (d4 <= d3)
    cond_c = (d6 >= 0) & (d5 <= d6)
    cond_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    cond_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    cond_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    pt = jnp.where(cond_bc[..., None], pt_bc, pt)
    pt = jnp.where(cond_ac[..., None], pt_ac, pt)
    pt = jnp.where(cond_ab[..., None], pt_ab, pt)
    pt = jnp.where(cond_c[..., None], c, pt)
    pt = jnp.where(cond_b[..., None], b, pt)
    pt = jnp.where(cond_a[..., None], a, pt)
    return pt


def mesh_contact_query(grid: MeshGrid, points: jax.Array):
    """Closest surface point/normal for query points (P, 3).

    Returns (sdist (P,), normal (P, 3), closest (P, 3)).  ``normal`` is
    the closest triangle's winding normal (outward for correctly-oriented
    scene meshes); ``sdist`` is negative when the point is behind it
    (penetrating), so contacts fire for tunneled points too.  Points in
    empty cells get sdist = +inf.
    """
    nx, ny, nz = grid.dims
    rel = (points - grid.origin) / grid.cell_size
    ci = jnp.clip(rel.astype(jnp.int32), 0,
                  jnp.array([nx - 1, ny - 1, nz - 1]))
    flat = (ci[:, 0] * ny + ci[:, 1]) * nz + ci[:, 2]
    cand = grid.cell_tris[flat]  # (P, M)
    valid = cand >= 0
    cand_c = jnp.maximum(cand, 0)

    a = grid.tri_a[cand_c]
    b = grid.tri_b[cand_c]
    c = grid.tri_c[cand_c]
    cp = _closest_point_on_triangle(points[:, None, :], a, b, c)  # (P, M, 3)
    d = jnp.linalg.norm(cp - points[:, None, :], axis=-1)
    d = jnp.where(valid, d, jnp.inf)
    best = jnp.argmin(d, axis=1)
    take = lambda x: jnp.take_along_axis(
        x, best[:, None, None].repeat(x.shape[-1], -1), axis=1
    )[:, 0]
    closest = take(cp)
    dist = jnp.min(d, axis=1)
    tri_idx = jnp.take_along_axis(cand_c, best[:, None], 1)[:, 0]
    tri_n = grid.tri_n[tri_idx]
    to_pt = points - closest
    sign = jnp.sign(jnp.sum(to_pt * tri_n, axis=-1))
    sign = jnp.where(sign == 0, 1.0, sign)
    sdist = dist * sign
    return sdist, tri_n, closest


def mesh_closest_triangle(grid: MeshGrid, points: jax.Array) -> jax.Array:
    """(P,) nearest-triangle index per query point (grid candidates;
    points in empty cells get index 0 — pair with a distance check)."""
    nx, ny, nz = grid.dims
    rel = (points - grid.origin) / grid.cell_size
    ci = jnp.clip(rel.astype(jnp.int32), 0,
                  jnp.array([nx - 1, ny - 1, nz - 1]))
    flat = (ci[:, 0] * ny + ci[:, 1]) * nz + ci[:, 2]
    cand = grid.cell_tris[flat]
    valid = cand >= 0
    cand_c = jnp.maximum(cand, 0)
    a = grid.tri_a[cand_c]
    b = grid.tri_b[cand_c]
    c = grid.tri_c[cand_c]
    cp = _closest_point_on_triangle(points[:, None, :], a, b, c)
    d = jnp.linalg.norm(cp - points[:, None, :], axis=-1)
    d = jnp.where(valid, d, jnp.inf)
    best = jnp.argmin(d, axis=1)
    return jnp.take_along_axis(cand_c, best[:, None], 1)[:, 0]
