"""Small-matrix linear algebra helpers.

XLA's TPU backend compiles tall-skinny matmuls with tiny contraction
dims (e.g. (N,3)@(3,3) at N=1M) pathologically slowly (~50 s each, and
they waste the MXU at runtime anyway).  These helpers expand 3-wide
contractions into explicit VPU broadcasts, which compile in <1 s and
fuse with neighbors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_rotation(pts: jax.Array, rot: jax.Array) -> jax.Array:
    """(N, 3) @ rot.T — i.e. rotate row vectors by ``rot`` (3, 3)."""
    return jnp.stack(
        [
            pts[..., 0] * rot[0, 0] + pts[..., 1] * rot[0, 1] + pts[..., 2] * rot[0, 2],
            pts[..., 0] * rot[1, 0] + pts[..., 1] * rot[1, 1] + pts[..., 2] * rot[1, 2],
            pts[..., 0] * rot[2, 0] + pts[..., 1] * rot[2, 1] + pts[..., 2] * rot[2, 2],
        ],
        axis=-1,
    )


def apply_rotation_t(pts: jax.Array, rot: jax.Array) -> jax.Array:
    """(N, 3) @ rot — rotate row vectors by ``rot.T``."""
    return jnp.stack(
        [
            pts[..., 0] * rot[0, 0] + pts[..., 1] * rot[1, 0] + pts[..., 2] * rot[2, 0],
            pts[..., 0] * rot[0, 1] + pts[..., 1] * rot[1, 1] + pts[..., 2] * rot[2, 1],
            pts[..., 0] * rot[0, 2] + pts[..., 1] * rot[1, 2] + pts[..., 2] * rot[2, 2],
        ],
        axis=-1,
    )


def transform_points(pts: jax.Array, rot: jax.Array, t: jax.Array):
    """rot @ p + t for row-vector points (N, 3)."""
    return apply_rotation(pts, rot) + t
