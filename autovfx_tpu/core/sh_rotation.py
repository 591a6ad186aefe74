"""Spherical-harmonics rotation.

Parity target: ``rotation_utils.py:153`` (transform_shs — Wigner-style SH
rotation via e3nn; the reference computes it but leaves the call
commented out in gaussians_utils.py:105, so edits ship with unrotated
SH — we expose it as an opt-in for higher-fidelity object transforms).

Method: exact band-limited projection instead of Wigner matrices — for a
rotation R, the 16×16 change-of-coefficients matrix solves
``B c' = B_rot c`` over ≥16 well-spread directions, where B[i,k] =
Y_k(d_i) and B_rot[i,k] = Y_k(R⁻¹ d_i).  Exact for functions in the
band-limited SH space (least squares is interpolation when the basis is
full rank), with no per-band recurrences to get wrong.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from autovfx_tpu.core import sh as sh_lib


def _fibonacci_dirs(n: int = 64) -> np.ndarray:
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta),
         np.cos(phi)],
        axis=-1,
    )


def _basis(dirs: np.ndarray, degree: int = 3) -> np.ndarray:
    """(D, K) real SH basis evaluated with the same convention as
    core/sh.eval_sh (one coefficient = 1 at a time)."""
    k = sh_lib.num_sh_coeffs(degree)
    d = len(dirs)
    out = np.zeros((d, k), np.float64)
    dirs_j = jnp.asarray(dirs, jnp.float32)
    for ki in range(k):
        coeffs = jnp.zeros((1, k, 3)).at[0, ki, :].set(1.0)
        vals = sh_lib.eval_sh(
            degree, jnp.broadcast_to(coeffs, (d, k, 3)), dirs_j
        )
        out[:, ki] = np.asarray(vals[:, 0], np.float64)
    return out


def sh_rotation_matrix(rot: np.ndarray, degree: int = 3) -> np.ndarray:
    """(K, K) matrix M with c' = M @ c for world rotation ``rot``."""
    dirs = _fibonacci_dirs(4 * sh_lib.num_sh_coeffs(degree))
    b = _basis(dirs, degree)
    b_rot = _basis(dirs @ rot, degree)  # rows: Y(R^-1 d) = Y(d @ R)
    m, *_ = np.linalg.lstsq(b, b_rot, rcond=None)
    return m.astype(np.float32)


def rotate_sh(sh_coeffs, rot: np.ndarray):
    """Rotate (N, K, 3) SH coefficients by a single rotation matrix."""
    k = sh_coeffs.shape[1]
    degree = int(round(k**0.5)) - 1
    m = jnp.asarray(sh_rotation_matrix(np.asarray(rot), min(degree, 3)))
    km = m.shape[0]
    head = jnp.einsum("kj,njc->nkc", m, sh_coeffs[:, :km])
    return jnp.concatenate([head, sh_coeffs[:, km:]], axis=1)
