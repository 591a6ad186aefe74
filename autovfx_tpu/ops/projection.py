"""Per-Gaussian screen-space preprocess (differentiable, vectorized JAX).

Parity target: ``cuda_rasterizer/forward.cu`` preprocessCUDA (:155-256),
computeCov2D (:74-113), computeCov3D (:118-151) and ndc2Pix semantics.
Everything here is plain jnp on (N, ...) arrays — the TPU-friendly shape:
XLA fuses it into a handful of VPU loops, and autodiff provides the
backward pass (replacing ``backward.cu`` computeCov2DCUDA/preprocessCUDA).

Pixel convention: matches CUDA — ``pix = ((ndc+1)*S - 1)/2`` i.e. pixel
centers at integer coordinates, ``mean2d = f * t_xy/t_z + c - 0.5``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from autovfx_tpu.core import sh as sh_lib
from autovfx_tpu.core.cameras import Camera
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.core.quaternion import quat_to_rotmat
from autovfx_tpu.utils.linalg import transform_points

TILE = 16  # BLOCK_X = BLOCK_Y = 16 (config.h:16-17)
NEAR_Z = 0.2  # in_frustum near cull (auxiliary.h)
COV2D_DILATION = 0.3  # low-pass filter (forward.cu:110-111)


class Splats2D(NamedTuple):
    """Screen-space Gaussians, one slot per input Gaussian (masked)."""

    mean2d: jax.Array  # (N, 2) pixel coords (CUDA convention)
    conic: jax.Array  # (N, 3) inverse 2D covariance (a, b, c)
    color: jax.Array  # (N, 3) RGB from SH
    opacity: jax.Array  # (N,)
    depth: jax.Array  # (N,) view-space z
    radius: jax.Array  # (N,) int32 pixel radius (0 => culled)
    tile_min: jax.Array  # (N, 2) int32 inclusive tile rect min (x, y)
    tile_max: jax.Array  # (N, 2) int32 exclusive tile rect max (x, y)
    tiles_touched: jax.Array  # (N,) int32 number of covered tiles


def compute_cov3d(g: Gaussians, scaling_modifier: float = 1.0) -> jax.Array:
    """(N, 6) packed upper-triangular world covariance [xx,xy,xz,yy,yz,zz].

    Fully scalarized (no (N,3,3) intermediates): XLA TPU lowers batched
    3x3 matmuls ~10x slower than the equivalent fused VPU elementwise
    graph (28 ms -> ~3 ms at N=1M).  Σ_ij = Σ_k s_k² R_ik R_jk with the
    rotation entries written out from the quaternion.
    """
    q = g.rotations
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    s = g.scales * scaling_modifier
    s0, s1, s2 = s[:, 0] ** 2, s[:, 1] ** 2, s[:, 2] ** 2
    c_xx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    c_xy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    c_xz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    c_yy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    c_yz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    c_zz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return jnp.stack([c_xx, c_xy, c_xz, c_yy, c_yz, c_zz], axis=-1)


def preprocess(
    g: Gaussians,
    cam: Camera,
    scaling_modifier: float = 1.0,
    override_color: jax.Array | None = None,
    sh_degree: int | None = None,
    mean2d_offset: jax.Array | None = None,
    tile: int = TILE,
) -> Splats2D:
    """Project all Gaussians to screen space.

    ``mean2d_offset`` is an all-zeros (N, 2) array whose *gradient* gives the
    screen-space position gradients used by densification (the reference's
    ``screenspace_points`` trick, gaussian_renderer/__init__.py:91-96).
    """
    w, h = cam.width, cam.height
    tiles_x = (w + tile - 1) // tile
    tiles_y = (h + tile - 1) // tile

    # View transform (elementwise — see utils/linalg.py on why not @).
    p_view = transform_points(g.xyz, cam.R, cam.t)  # (N, 3)
    depth = p_view[:, 2]
    in_front = depth > NEAR_Z

    # 2D mean, CUDA pixel convention.
    safe_z = jnp.where(in_front, depth, 1.0)
    mean2d = jnp.stack(
        [
            cam.fx * p_view[:, 0] / safe_z + cam.cx - 0.5,
            cam.fy * p_view[:, 1] / safe_z + cam.cy - 0.5,
        ],
        axis=-1,
    )
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset

    # EWA 2D covariance (computeCov2D).
    tan_fovx = cam.tan_half_fovx
    tan_fovy = cam.tan_half_fovy
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(p_view[:, 0] / safe_z, -limx, limx) * safe_z
    ty = jnp.clip(p_view[:, 1] / safe_z, -limy, limy) * safe_z
    tz = safe_z

    cov3d = compute_cov3d(g, scaling_modifier)  # (N, 6)
    c_xx, c_xy, c_xz, c_yy, c_yz, c_zz = (cov3d[:, i] for i in range(6))

    # J rows (2x3): [fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2]
    j00 = cam.fx / tz
    j02 = -(cam.fx * tx) / (tz * tz)
    j11 = cam.fy / tz
    j12 = -(cam.fy * ty) / (tz * tz)

    # M = J @ W (2x3), W = w2c rotation.
    R = cam.R
    m0 = j00[:, None] * R[0] + j02[:, None] * R[2]  # (N, 3)
    m1 = j11[:, None] * R[1] + j12[:, None] * R[2]

    # cov2d = M Σ M^T
    def sigma_dot(v):  # Σ @ v, packed symmetric
        return jnp.stack(
            [
                c_xx * v[:, 0] + c_xy * v[:, 1] + c_xz * v[:, 2],
                c_xy * v[:, 0] + c_yy * v[:, 1] + c_yz * v[:, 2],
                c_xz * v[:, 0] + c_yz * v[:, 1] + c_zz * v[:, 2],
            ],
            axis=-1,
        )

    s_m0 = sigma_dot(m0)
    s_m1 = sigma_dot(m1)
    cov_a = jnp.sum(m0 * s_m0, axis=-1) + COV2D_DILATION
    cov_b = jnp.sum(m0 * s_m1, axis=-1)
    cov_c = jnp.sum(m1 * s_m1, axis=-1) + COV2D_DILATION

    det = cov_a * cov_c - cov_b * cov_b
    det_ok = det != 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack(
        [cov_c / safe_det, -cov_b / safe_det, cov_a / safe_det], axis=-1
    )

    # Screen-space extent.  CUDA uses a fixed 3σ (forward.cu:214-221);
    # we additionally clamp to the exact α ≥ 1/255 support radius
    # r = σ·sqrt(2·ln(255·op)) — pixels beyond it are skipped by the
    # blend's alpha cutoff in both implementations, so the rendered
    # output is identical while low-opacity splats touch fewer tiles.
    mid = 0.5 * (cov_a + cov_c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    op = g.opacity
    nsigma = jnp.sqrt(2.0 * jnp.log(jnp.maximum(op * 255.0, 1.0 + 1e-6)))
    radius_f = jnp.ceil(jnp.minimum(3.0, nsigma) * jnp.sqrt(lambda1))

    valid = in_front & det_ok
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    # Tile rect (getRect, auxiliary.h).  CUDA uses the circumscribed
    # circle (3·sqrt(λ1)); the rendered support is that circle clipped
    # to the α ≥ 1/255 ellipse {d ≤ nsigma}, whose axis projections are
    # ±nsigma·sqrt(Σxx/yy) — the per-axis min of the two bounds covers
    # the intersection exactly, so the output is identical while
    # anisotropic / low-opacity splats touch fewer tiles.
    # +1px absorbs the f32 band where the kernel's alpha test and this
    # analytic bound disagree at the support boundary
    rx = jnp.ceil(jnp.minimum(nsigma * jnp.sqrt(cov_a) + 1.0, radius_f))
    ry = jnp.ceil(jnp.minimum(nsigma * jnp.sqrt(cov_c) + 1.0, radius_f))
    px = mean2d[:, 0]
    py = mean2d[:, 1]
    rmin_x = jnp.clip(((px - rx) / tile).astype(jnp.int32), 0, tiles_x)
    rmin_y = jnp.clip(((py - ry) / tile).astype(jnp.int32), 0, tiles_y)
    rmax_x = jnp.clip(
        ((px + rx + tile - 1) / tile).astype(jnp.int32), 0, tiles_x
    )
    rmax_y = jnp.clip(
        ((py + ry + tile - 1) / tile).astype(jnp.int32), 0, tiles_y
    )
    area = (rmax_x - rmin_x) * (rmax_y - rmin_y)
    valid = valid & (area > 0) & g.active
    area = jnp.where(valid, area, 0)
    radius = jnp.where(valid, radius, 0)

    # Color from SH toward the camera (forward.cu computeColorFromSH).
    if override_color is not None:
        color = override_color
    else:
        color = g.colors(cam.center, degree=sh_degree)

    return Splats2D(
        mean2d=mean2d,
        conic=conic,
        color=color,
        opacity=jnp.where(valid, g.opacity, 0.0),
        depth=depth,
        radius=radius,
        tile_min=jnp.stack([rmin_x, rmin_y], axis=-1),
        tile_max=jnp.stack([rmax_x, rmax_y], axis=-1),
        tiles_touched=area.astype(jnp.int32),
    )
