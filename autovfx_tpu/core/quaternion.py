"""Quaternion / rotation utilities (pure JAX, vectorized).

Parity target: reference ``rotation_utils.py`` (matrix_to_quaternion :24,
quaternion_multiply :113) and the quaternion→rotation used by the CUDA
rasterizer (``cuda_rasterizer/forward.cu`` computeCov3D).  Convention is
(w, x, y, z) scalar-first, matching 3DGS checkpoints.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternions along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Matches the formula in the reference CUDA preprocess (forward.cu
    computeCov3D) so covariance construction is bit-comparable.
    """
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branch-free Shepperd's method (selects the largest-denominator branch
    with ``where`` so it is jit/vmap safe), replacing the reference's
    torch implementation (rotation_utils.py:24-110).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate solutions; pick the numerically best.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    q0 = jnp.stack(
        [safe_sqrt(1.0 + tr), m21 - m12, m02 - m20, m10 - m01], axis=-1
    )
    q1 = jnp.stack(
        [m21 - m12, safe_sqrt(1.0 + m00 - m11 - m22), m01 + m10, m02 + m20],
        axis=-1,
    )
    q2 = jnp.stack(
        [m02 - m20, m01 + m10, safe_sqrt(1.0 - m00 + m11 - m22), m12 + m21],
        axis=-1,
    )
    q3 = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, safe_sqrt(1.0 - m00 - m11 + m22)],
        axis=-1,
    )
    # Scale each candidate so its pivot component equals the sqrt term.
    q0 = q0 / (2.0 * q0[..., 0:1])
    q0 = q0.at[..., 0].set(safe_sqrt(1.0 + tr) / 2.0)
    q1 = q1 / (2.0 * q1[..., 1:2])
    q1 = q1.at[..., 1].set(safe_sqrt(1.0 + m00 - m11 - m22) / 2.0)
    q2 = q2 / (2.0 * q2[..., 2:3])
    q2 = q2.at[..., 2].set(safe_sqrt(1.0 - m00 + m11 - m22) / 2.0)
    q3 = q3 / (2.0 * q3[..., 3:4])
    q3 = q3.at[..., 3].set(safe_sqrt(1.0 - m00 - m11 + m22) / 2.0)

    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    scores = jnp.stack(
        [tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1
    )
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    return quat_normalize(q)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of wxyz quaternions (rotation_utils.py:113)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """(..., 3) unit axis, (...) angle in radians -> (..., 4) wxyz."""
    half = angle[..., None] * 0.5
    return jnp.concatenate(
        [jnp.cos(half), axis * jnp.sin(half)], axis=-1
    )


def quat_integrate(q: jax.Array, omega: jax.Array, dt: float) -> jax.Array:
    """Integrate orientation by angular velocity omega (world frame, rad/s).

    q' = normalize(q + dt/2 * (0, omega) ⊗ q); used by the rigid-body solver.
    """
    omega_q = jnp.concatenate([jnp.zeros_like(omega[..., :1]), omega], axis=-1)
    dq = 0.5 * quat_multiply(omega_q, q)
    return quat_normalize(q + dt * dq)


def euler_to_rotmat(rx: jax.Array, ry: jax.Array, rz: jax.Array) -> jax.Array:
    """XYZ-order Euler angles (radians) -> rotation matrix.

    Matches Blender's default 'XYZ' euler convention used for the edit IR
    rotations (reference all_rendering.py camera/object setup).
    """
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    rot_x = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], dtype=jnp.float32)
    rot_y = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], dtype=jnp.float32)
    rot_z = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], dtype=jnp.float32)
    return rot_z @ rot_y @ rot_x
