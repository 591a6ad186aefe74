"""Quadric edge-collapse mesh decimation (QEM).

Parity target: o3d ``simplify_quadric_decimation`` used at
``sugar_extractors/coarse_mesh.py:441-458`` (200k/1M-vertex targets).

Vectorized multiple-choice variant: per round, vertex quadrics are
rebuilt from face planes, every edge is scored with the midpoint
quadric error, and a maximal independent set of cheapest edges (no
shared vertices — found with one argsort + first-occurrence masks) is
collapsed at once.  Rounds repeat until the vertex target; this is the
standard parallel-QEM formulation (numpy host-side, like the
reference's o3d call).
"""
from __future__ import annotations

import numpy as np


def _vertex_quadrics(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """(V, 4, 4) accumulated fundamental error quadrics."""
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    n = np.cross(b - a, c - a)
    area = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(area, 1e-12)
    d = -np.sum(n * a, axis=1, keepdims=True)
    p = np.concatenate([n, d], axis=1)  # (F, 4)
    K = (area[:, :, None] * p[:, :, None]) * p[:, None, :]  # area-weighted
    Q = np.zeros((len(verts), 4, 4))
    for k in range(3):
        np.add.at(Q, faces[:, k], K)
    return Q


def _edges_of(faces: np.ndarray) -> np.ndarray:
    e = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)


def decimate_quadric(
    verts: np.ndarray,
    faces: np.ndarray,
    target_vertices: int,
    max_rounds: int = 64,
):
    """Collapse edges until <= target_vertices.  Returns (verts, faces)."""
    verts = np.asarray(verts, np.float64).copy()
    faces = np.asarray(faces, np.int64).copy()
    for _ in range(max_rounds):
        if len(verts) <= target_vertices or len(faces) == 0:
            break
        Q = _vertex_quadrics(verts, faces)
        edges = _edges_of(faces)
        if len(edges) == 0:
            break
        mid = 0.5 * (verts[edges[:, 0]] + verts[edges[:, 1]])
        mid_h = np.concatenate([mid, np.ones((len(mid), 1))], axis=1)
        Qe = Q[edges[:, 0]] + Q[edges[:, 1]]
        cost = np.einsum("ei,eij,ej->e", mid_h, Qe, mid_h)

        order = np.argsort(cost)
        se = edges[order]
        # independent set: keep an edge iff it is the FIRST (cheapest)
        # edge touching both of its endpoints
        first_of = np.full(len(verts), -1, np.int64)
        flat = se.reshape(-1)
        pos = np.repeat(np.arange(len(se)), 2)
        # reversed so earlier (cheaper) edges overwrite later ones
        first_of[flat[::-1]] = pos[::-1]
        keep = (first_of[se[:, 0]] == np.arange(len(se))) & (
            first_of[se[:, 1]] == np.arange(len(se))
        )
        # don't overshoot the target
        budget = max(len(verts) - target_vertices, 0)
        chosen = se[keep][:budget]
        if len(chosen) == 0:
            break

        # collapse b -> a at the midpoint
        a_idx, b_idx = chosen[:, 0], chosen[:, 1]
        verts[a_idx] = 0.5 * (verts[a_idx] + verts[b_idx])
        remap = np.arange(len(verts))
        remap[b_idx] = a_idx
        faces = remap[faces]
        # drop degenerate faces
        good = (
            (faces[:, 0] != faces[:, 1])
            & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2])
        )
        faces = faces[good]
        # compact unused vertices
        used = np.zeros(len(verts), bool)
        used[faces.reshape(-1)] = True
        new_id = np.cumsum(used) - 1
        verts = verts[used]
        faces = new_id[faces]
    return verts.astype(np.float32), faces


def density_quantile_prune(
    verts: np.ndarray,
    faces: np.ndarray,
    densities: np.ndarray,
    quantile: float = 0.1,
):
    """Drop vertices in the lowest density quantile + their faces
    (coarse_mesh.py:441-449: Poisson density prune analog)."""
    if len(verts) == 0:
        return verts, faces
    thr = np.quantile(densities, quantile)
    keep = densities >= thr
    new_id = np.cumsum(keep) - 1
    face_ok = keep[faces].all(axis=1)
    faces = new_id[faces[face_ok]]
    return verts[keep], faces


def remove_small_components(
    verts: np.ndarray,
    faces: np.ndarray,
    min_frac: float = 0.01,
):
    """Drop connected components with < ``min_frac`` of all faces
    (spurious Poisson/TSDF blobs; o3d cluster-removal analog)."""
    if len(faces) == 0:
        return verts, faces
    parent = np.arange(len(verts))

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b, c in faces:
        ra, rb, rc = find(a), find(b), find(c)
        parent[rb] = ra
        parent[rc] = ra
    roots = np.array([find(f) for f in faces[:, 0]])
    uniq, counts = np.unique(roots, return_counts=True)
    keep_roots = set(uniq[counts >= max(min_frac * len(faces), 1)])
    face_ok = np.array([r in keep_roots for r in roots])
    faces = faces[face_ok]
    used = np.zeros(len(verts), bool)
    used[faces.reshape(-1)] = True
    new_id = np.cumsum(used) - 1
    return verts[used], new_id[faces]
